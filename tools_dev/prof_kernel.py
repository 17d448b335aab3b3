"""TPU: isolate pallas_call cost from XLA pack/unpack around it."""
import time, sys
import numpy as np
import jax, jax.numpy as jnp
from nnnoiseless_tpu import RnnModel, init_batch_carry
from nnnoiseless_tpu.chunk import precompute_chunk
from nnnoiseless_tpu.constants import CEPS_MEM, NB_BANDS, FRAME_SIZE
from nnnoiseless_tpu.ops import frame_kernel as fk
from nnnoiseless_tpu.ops.rnn_pallas import meta_acts, _flatten_params

B = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
T = int(sys.argv[2]) if len(sys.argv) > 2 else 100
rng = np.random.RandomState(0)
frames = jnp.asarray((rng.randn(B, T, 480) * 3000).astype(np.float32))
model = RnnModel.default()
carry = init_batch_carry(model.meta, B)
jax.block_until_ready((frames, carry))

def force(out):
    return [float(jnp.ravel(l)[0]) for l in jax.tree_util.tree_leaves(out)]

def timeit(name, fn, *args, n=3):
    out = fn(*args); force(out)
    best = 1e9
    for _ in range(n):
        t0 = time.perf_counter(); out = fn(*args); force(out)
        best = min(best, time.perf_counter() - t0)
    print(f"{name:30s} {best*1000:9.1f} ms   ({B*T/best/100:.0f}x rt)", flush=True)
    return out

pre, hp2 = jax.jit(precompute_chunk)(carry.feat.input_mem, carry.feat.hp_mem, frames)
jax.block_until_ready(jax.tree_util.tree_leaves(pre))
t, b = T, B
feat = carry.feat
carry_arrays = (
    feat.input_mem, carry.synthesis_mem,
    feat.cepstral_mem.reshape(b, CEPS_MEM * NB_BANDS),
    carry.rnn.vad, carry.rnn.noise, carry.rnn.denoise, carry.lastg,
    feat.pitch_period.reshape(b, 1).astype(jnp.int32),
    feat.pitch_gain.reshape(b, 1),
)

@jax.jit
def pack(pre):
    def pad_to(a, w):
        return jnp.pad(a, ((0, 0), (0, 0), (0, w - a.shape[2])))
    return jnp.concatenate(
        [
            pad_to(pre.filtered, 512), pad_to(pre.x, 1024),
            pad_to(pre.corr_full, 512), pad_to(pre.yy_lookup, 512),
            pad_to(pre.ex, 128), pad_to(pre.ceps, 128),
            pre.silence.astype(jnp.float32).reshape(t, b, 1),
            pre.pitch_idx.astype(jnp.float32).reshape(t, b, 1),
            pre.xx.reshape(t, b, 1),
            jnp.zeros((t, b, 125), jnp.float32),
        ],
        axis=-1,
    )

packed = timeit("pack concat", pack, pre)
jax.block_until_ready(packed)
weights = _flatten_params(model.params)
acts = meta_acts(model.meta)

def kern(ca, pk):
    return fk.frame_loop_pallas(weights, ca, pk, acts)
kern_j = jax.jit(kern)
po, cf = timeit("pallas_call only", kern_j, carry_arrays, packed)

@jax.jit
def unpack(po):
    return jnp.swapaxes(po[:, :, :480], 0, 1), jnp.swapaxes(po[:, :, 480:481], 0, 1)
timeit("unpack+swap", unpack, po)
