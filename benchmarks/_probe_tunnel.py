import time, jax, jax.numpy as jnp, numpy as np
x = jnp.ones((2048, 2048), jnp.bfloat16)
f = jax.jit(lambda a: a @ a)
np.asarray(f(x))[0,0]
t0 = time.perf_counter()
for _ in range(20): y = f(x)
np.asarray(y)[0,0]
print(f"matmul amortized {(time.perf_counter()-t0)/20*1e3:.2f} ms (healthy ~2 ms)")
h = np.zeros((8*1024*1024,), np.float32)
t0 = time.perf_counter(); d = jax.device_put(h); np.asarray(d[0]); dt = time.perf_counter()-t0
print(f"link {h.nbytes/dt/1e6:.1f} MB/s (healthy ~40)")
