import time, numpy as np, jax, jax.numpy as jnp
from functools import partial
x = jnp.ones((2048, 2048), jnp.bfloat16)
@jax.jit
def f(a):
    def body(i, c):
        return c @ a * 0.001
    return jax.lax.fori_loop(0, 100, body, a)
np.asarray(f(x))[0, 0]
t0 = time.perf_counter()
y = f(x)
np.asarray(y)[0, 0]
dt = time.perf_counter() - t0
print(f"100 chained 2048^3 matmuls, one dispatch: {dt*1e3:.1f} ms total -> {dt/100*1e3:.3f} ms/matmul", flush=True)
