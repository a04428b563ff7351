"""Fine-grained timing inside the volume renderer + SR."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def timeit(name, fn, *args, iters=10):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:36s} {dt*1000:8.2f} ms")
    return out


def main():
    from invertavatar_tpu.render.renderer import ImportanceRenderer, sample_from_planes
    from invertavatar_tpu.render.ray_sampler import sample_rays
    from invertavatar_tpu.flagship import FLAGSHIP_RENDERING_KWARGS, example_inputs

    rng = np.random.RandomState(0)
    B, C, H = 1, 32, 256
    planes = jnp.asarray(rng.randn(B, 3, H, H, C).astype(np.float32))
    _, c, _ = example_inputs(1)
    cam2world = c[:, :16].reshape(-1, 4, 4)
    K = c[:, 16:25].reshape(-1, 3, 3)
    ro, rd = sample_rays(cam2world, K, 128)

    W1 = jnp.asarray(rng.randn(32, 64).astype(np.float32) * 0.1)
    W2 = jnp.asarray(rng.randn(64, 33).astype(np.float32) * 0.1)

    def decoder(feats):
        x = jnp.mean(feats, axis=1)
        x = jax.nn.softplus(x @ W1)
        x = x @ W2
        return {"rgb": jax.nn.sigmoid(x[..., 1:]) * 1.002 - 0.001, "sigma": x[..., 0:1]}

    M = 128 * 128 * 48
    coords = jnp.asarray(rng.rand(B, M, 3).astype(np.float32) - 0.5)

    timeit("sample_from_planes(786k pts)", jax.jit(lambda p, co: sample_from_planes(p, co, 1.0)), planes, coords)

    feats = sample_from_planes(planes, coords, 1.0)
    timeit("decoder MLP(786k pts)", jax.jit(lambda f: decoder(f)["rgb"]), feats)

    # sort-merge of 96 samples
    d1 = jnp.sort(jnp.asarray(rng.rand(B, 128 * 128, 48, 1).astype(np.float32)), axis=-2)
    d2 = jnp.sort(jnp.asarray(rng.rand(B, 128 * 128, 48, 1).astype(np.float32)), axis=-2)
    c1 = jnp.asarray(rng.rand(B, 128 * 128, 48, 32).astype(np.float32))
    s1 = jnp.asarray(rng.rand(B, 128 * 128, 48, 1).astype(np.float32))

    def unify(d1, c1, s1, d2, c2, s2):
        return ImportanceRenderer._unify_samples(d1, c1, s1, d2, c2, s2)

    timeit("unify(sort 96)", jax.jit(unify), d1, c1, s1, d2, c1, s1)

    r = ImportanceRenderer()
    opts = dict(FLAGSHIP_RENDERING_KWARGS)
    timeit(
        "full renderer(48+48)",
        jax.jit(lambda p, ro, rd: r(p, decoder, ro, rd, opts, evaluation=True)[0]),
        planes, ro, rd,
    )

    # SR alone
    from invertavatar_tpu.models.superresolution import SuperresolutionHybrid8XDC

    sr = SuperresolutionHybrid8XDC(channels=32, img_resolution=512, sr_num_fp16_res=0, sr_antialias=True)
    feat_img = jnp.asarray(rng.randn(1, 128, 128, 32).astype(np.float32))
    ws = jnp.asarray(rng.randn(1, 14, 512).astype(np.float32))
    v = sr.init({"params": jax.random.PRNGKey(0), "buffers": jax.random.PRNGKey(1)}, feat_img[..., :3], feat_img, ws, noise_mode="const")
    timeit("SR 128->512", jax.jit(lambda v, f, w: sr.apply(v, f[..., :3], f, w, noise_mode="const")), v, feat_img, ws)


if __name__ == "__main__":
    main()
