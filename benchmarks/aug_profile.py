"""Per-op timing of the exploration augmentation pipeline on the real chip.

explore_roofline.py showed the two-view aug phase costs more than the model
grad at tutorial scale (bs=256, bbox=36); this isolates which op pays.

Run from the repo root (TPU attached): python benchmarks/aug_profile.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from _timing import timed  # benchmarks/_timing.py: scalar-fetch fence



def main():
    import jax
    import jax.numpy as jnp

    from cet_pick_tpu.ops import augment as A

    print(f"devices: {jax.devices()}")
    b, c, hw = 256, 2, 36
    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.standard_normal((b, c, hw, hw)), jnp.float32)
    keys = jax.random.split(jax.random.PRNGKey(0), b)
    mean = jnp.asarray([0.1, 0.2], jnp.float32)
    std = jnp.asarray([1.1, 0.9], jnp.float32)

    ops = {
        "hflip": lambda im, k: A.random_hflip(im, k),
        "vflip": lambda im, k: A.random_vflip(im, k),
        "rotate30": lambda im, k: A.random_rotate(im, k),
        "corner_erase": lambda im, k: A.corner_erase(im, k),
        "rot90": lambda im, k: A.rot90_random(im, k),
        "color_jitter": lambda im, k: A.color_jitter(im, k),
        "rrc": lambda im, k: A.random_resized_crop(im, k, hw),
        "normalize": lambda im, k: A.normalize(im, mean, std),
    }
    for name, op in ops.items():
        f = jax.jit(jax.vmap(op))
        t = timed(f, imgs, keys)
        print(f"{name:<14} {t*1e3:8.2f} ms")

    f = jax.jit(partial_pipeline(A, mean, std, hw, True))
    print(f"strong 2d3d    {timed(f, imgs, keys)*1e3:8.2f} ms")
    f = jax.jit(partial_pipeline(A, mean, std, hw, False))
    print(f"weak 2d3d      {timed(f, imgs, keys)*1e3:8.2f} ms")


def partial_pipeline(A, mean, std, out_size, strong):
    import jax

    def one(img, key):
        return A.simsiam_augment(
            img[None], key[None], mean, std, out_size, strong=strong
        )[0]

    return jax.vmap(one)


if __name__ == "__main__":
    main()
