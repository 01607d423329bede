import numpy as np, jax, jax.numpy as jnp
from renderengine_tpu.core import engine; engine.init()
from renderengine_tpu.utils.profiling import time_jitted
# isolate: stable 2-op sort at bench sizes
for n in (262_144, 524_288, 1_048_576):
    k = jax.device_put(np.random.randint(0, 2048, n).astype(np.int32))
    v = jax.device_put(np.random.randint(0, 260_000, n).astype(np.int32))
    f = jax.jit(lambda k, v: jax.lax.sort((k, v), num_keys=1, is_stable=True)[1])
    r = time_jitted(f, k, v, reps=5)
    print(f'sort2 n={n}: {r["median"]*1000:.1f} ms')
# cummax at 1M
x = jax.device_put(np.random.randint(0, 100, 1_048_576).astype(np.int32))
f = jax.jit(jax.lax.cummax)
r = time_jitted(f, x, reps=5)
print(f'cummax 1M: {r["median"]*1000:.1f} ms')
# cumsum 260k
y = jax.device_put(np.random.randint(0, 8, 262_144).astype(np.int32))
r = time_jitted(jax.jit(jnp.cumsum), y, reps=5)
print(f'cumsum 262k: {r["median"]*1000:.1f} ms')
# int div-mod via gathered divisor at 1M
nx = jax.device_put(np.random.randint(1, 5, 262_144).astype(np.int32))
tri = jax.device_put(np.random.randint(0, 262_144, 1_048_576).astype(np.int32))
sl = jax.device_put(np.arange(1_048_576, dtype=np.int32))
f = jax.jit(lambda nx, tri, sl: (sl // nx[tri]) + (sl - (sl // nx[tri]) * nx[tri]))
r = time_jitted(f, nx, tri, sl, reps=5)
print(f'divmod+gather 1M: {r["median"]*1000:.1f} ms')
