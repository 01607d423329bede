import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
import time, numpy as np, jax.numpy as jnp

def timeit(name, f, *a):
    g = jax.jit(f)
    float(g(*a))
    t0=time.time()
    for _ in range(8): o=g(*a)
    float(o)
    print(f'{name:44s} {(time.time()-t0)/8*1000:9.2f} ms', flush=True)

N = 8_000_000
M = 2_457_600  # = 307200 px * 8 taps
tbl_u8 = jax.device_put(np.random.randint(0,255,(N,4),dtype=np.uint8))
tbl_i32 = jax.device_put(np.random.randint(-2**31,2**31-1,N,dtype=np.int32))
idx_rand = jax.device_put(np.random.randint(0,N,M).astype(np.int32))
idx_sorted = jax.device_put(np.sort(np.random.randint(0,N,M)).astype(np.int32))
idx_coherent = jax.device_put((np.repeat(np.random.randint(0,N-2048,M//256),256) + np.tile(np.arange(256),M//256)).astype(np.int32))

timeit('u8[4] rows, random idx', lambda t,i: jnp.sum(t[i].astype(jnp.float32)), tbl_u8, idx_rand)
timeit('i32 flat, random idx', lambda t,i: jnp.sum(t[i]), tbl_i32, idx_rand)
timeit('i32 flat, sorted idx', lambda t,i: jnp.sum(t[i]), tbl_i32, idx_sorted)
timeit('i32 flat, coherent idx', lambda t,i: jnp.sum(t[i]), tbl_i32, idx_coherent)
timeit('i32 take sorted-hint', lambda t,i: jnp.sum(jnp.take(t, i, indices_are_sorted=True)), tbl_i32, idx_sorted)
# 2D-shaped indices (as in our shading: [H,W])
idx2d = idx_rand.reshape(480, -1)
timeit('i32 flat, [H,W] idx', lambda t,i: jnp.sum(t[i]), tbl_i32, idx2d)
# small table (VMEM-size)
tbl_small = tbl_i32[:1_000_000]
idx_small = jax.device_put(np.random.randint(0,1_000_000,M).astype(np.int32))
timeit('i32 1M-entry table, random', lambda t,i: jnp.sum(t[i]), tbl_small, idx_small)
tbl_tiny = tbl_i32[:16_384]
idx_tiny = jax.device_put(np.random.randint(0,16_384,M).astype(np.int32))
timeit('i32 16k-entry table, random', lambda t,i: jnp.sum(t[i]), tbl_tiny, idx_tiny)
