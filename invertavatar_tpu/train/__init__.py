from .gan import GANLossConfig, make_gan_train_step, Schedules  # noqa: F401
from .state import TrainState, adam_with_lazy_reg, ema_update  # noqa: F401
