import numpy as np, jax, jax.numpy as jnp, sys
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

def make(L, k):
    def kern(t_ref, i_ref, o_ref):
        idx = i_ref[:, :]
        if k < L:
            idx = jnp.concatenate([idx, jnp.zeros((idx.shape[0], L-k), jnp.int32)], axis=1)
        g = jnp.take_along_axis(t_ref[:, :], idx, axis=1, mode="promise_in_bounds")
        o_ref[:, :] = g[:, :k]
    return kern

for (L, k) in [(512, 512), (512, 96), (385, 1), (256, 96)]:
    tab = jnp.asarray(np.random.rand(128, L).astype(np.float32))
    idx = jnp.asarray(np.random.randint(0, L, (128, k)).astype(np.int32))
    try:
        out = pl.pallas_call(
            make(L, k),
            out_shape=jax.ShapeDtypeStruct((128, k), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)]*2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(tab, idx)
        ref = np.take_along_axis(np.asarray(tab), np.asarray(idx), axis=1)
        ok = np.array_equal(np.asarray(out), ref)
        print(f"L={L} k={k}: OK match={ok}", flush=True)
    except Exception as e:
        print(f"L={L} k={k}: FAIL {type(e).__name__}: {str(e)[:300]}", flush=True)
