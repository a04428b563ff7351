from .dataset import AvatarDataset, VideoDataset, InfiniteSampler, prefetch_batches  # noqa: F401
