import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
import time, numpy as np, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TBL = 1024
N_IT = 19  # 19 * 131072 = 2.49M lookups
def kernel(tbl_ref, idx_ref, out_ref):
    t = tbl_ref[:]                       # [1024,128]
    def body(c, _):
        ix = idx_ref[c]                  # [1024,128] same shape as table
        out_ref[c] = jnp.take_along_axis(t, ix, axis=0)
        return 0
    jax.lax.fori_loop(0, N_IT, body, 0)

def run(idx):
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((N_IT,TBL,128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(tbl, idx)

tbl = jax.device_put(np.random.rand(TBL,128).astype(np.float32))
idx = jax.device_put(np.random.randint(0,TBL,(N_IT,TBL,128)).astype(np.int32))
f = jax.jit(run)
o = f(idx); float(o.sum())
t0=time.time()
for _ in range(8): o = f(idx)
float(o.sum())
dt = (time.time()-t0)/8
n = N_IT*TBL*128
print(f'pallas VMEM take_along_axis: {dt*1000:.2f} ms for {n/1e6:.2f}M lookups = {dt/n*1e9:.2f} ns/lookup')
