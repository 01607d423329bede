import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
import time, numpy as np, jax.numpy as jnp
def timeit(name, f, *a):
    g = jax.jit(f); float(g(*a))
    t0=time.time()
    for _ in range(8): o=g(*a)
    float(o)
    print(f'{name:40s} {(time.time()-t0)/8*1000:9.2f} ms', flush=True)
M = 2_457_600
for width in (4, 16, 32, 64):
    tbl = jax.device_put(np.random.randint(0,255,(2_000_000,width),dtype=np.uint8))
    idx = jax.device_put(np.random.randint(0,2_000_000,M).astype(np.int32))
    timeit(f'u8[{width}] rows x 2.46M', lambda t,i: jnp.sum(t[i].astype(jnp.float32)), tbl, idx)
tblf = jax.device_put(np.random.rand(2_000_000,8).astype(np.float32))
idx = jax.device_put(np.random.randint(0,2_000_000,307_200).astype(np.int32))
timeit('f32[8] rows x 307k', lambda t,i: jnp.sum(t[i]), tblf, idx)
tblf2 = jax.device_put(np.random.rand(2_000_000,16).astype(np.float32))
timeit('f32[16] rows x 307k', lambda t,i: jnp.sum(t[i]), tblf2, idx)
