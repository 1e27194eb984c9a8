"""TPU validation: stream-accumulating GS backward vs slot backward vs oracle.

The stream kernel (_run_fused_bwd_stream) and the slot kernel
(_run_fused_bwd + routing sort) compute the same per-chunk gradient math;
they differ only in chunk alignment (CH vs 8) and where gradients land.
Comparing the two on TPU cancels the shared log-space-vs-cumprod numerics
that dominate the oracle diff (the 1/(1-alpha) term amplifies the fwd's
~1e-4 rel error to ~1e-3), so a semantic bug in the stream path shows up
as a LARGE diff here.
"""
import numpy as np
import jax
import jax.numpy as jnp

from nerficg_tpu.ops import gs_tiles_kernel as gtk

K = 256
NUM_TILES = 8160          # 1080p
rng = np.random.default_rng(0)

# Realistic segment structure: exponentially distributed counts, some zero.
counts = np.minimum(rng.geometric(1.0 / 90.0, NUM_TILES), 4 * K)
counts[rng.random(NUM_TILES) < 0.3] = 0
starts = np.concatenate([[0], np.cumsum(counts)[:-1]]).astype(np.int32)
e = int(counts.sum())
e_pad = (-(-(e + 3 * K) // K)) * K
print(f'tiles={NUM_TILES} entries={e} e_pad={e_pad}')

means = rng.uniform(-4.0, 20.0, (e_pad, 2))
conics = np.stack([rng.uniform(0.05, 0.3, e_pad),
                   rng.uniform(-0.02, 0.02, e_pad),
                   rng.uniform(0.05, 0.3, e_pad)], -1)
opac = rng.uniform(0.05, 0.9, (e_pad, 1))
colors = rng.uniform(0.0, 1.0, (e_pad, 3))
depths = rng.uniform(1.0, 5.0, (e_pad, 1))
mat = jnp.asarray(np.concatenate(
    [means, conics, opac, colors, depths, np.zeros((e_pad, 6))], 1),
    jnp.float32)
starts_j = jnp.asarray(starts)
counts_j = jnp.asarray(np.minimum(counts, K), jnp.int32)
dout = jnp.asarray(rng.normal(0, 1, (NUM_TILES, 8, gtk.P)), jnp.float32)
TILES_X = 120

stream = jax.jit(lambda: gtk._run_fused_bwd_stream(
    mat, starts_j, counts_j, dout, TILES_X, NUM_TILES, K))()
stream.block_until_ready()

# Old slot path + routing (lifted from _cs_bwd's k % CH != 0 branch).
d_slots = gtk._run_fused_bwd(mat, starts_j, counts_j, dout, TILES_X,
                             NUM_TILES, K)
window_start = (starts_j // 8) * 8
pos = jnp.arange(K + gtk.KPAD, dtype=jnp.int32)
entry_of_slot = window_start[:, None] + pos[None, :]
seg_end = starts_j + jnp.minimum(counts_j, K)
slot_valid = (entry_of_slot >= starts_j[:, None]) & \
    (entry_of_slot < seg_end[:, None])
flat_valid = slot_valid.reshape(-1)
t_slots = NUM_TILES * (K + gtk.KPAD)
big = jnp.int32(2 ** 30)
slot_keys = jnp.where(flat_valid, entry_of_slot.reshape(-1),
                      big + jnp.arange(t_slots, dtype=jnp.int32))
marks = jnp.zeros((e_pad + 1,), jnp.int32)
marks = marks.at[starts_j].add(1).at[seg_end].add(-1)
covered = jnp.cumsum(marks[:-1]) > 0
filler_keys = jnp.where(
    covered, big + big // 2 + jnp.arange(e_pad, dtype=jnp.int32),
    jnp.arange(e_pad, dtype=jnp.int32))
keys = jnp.concatenate([slot_keys, filler_keys])
grads = jnp.concatenate([
    d_slots.reshape(t_slots, 16) * flat_valid[:, None].astype(jnp.float32),
    jnp.zeros((e_pad, 16), jnp.float32)], axis=0)
ops = jax.lax.sort((keys,) + tuple(grads.T), num_keys=1)
slot = jnp.stack(ops[1:]).T[:e_pad]

s = np.asarray(stream)
o = np.asarray(slot)
diff = np.abs(s - o)
scale = np.abs(o).max(0) + 1e-8
print('stream-vs-slot per-channel max diff / max ref:')
for c in range(10):
    print(f'  ch{c}: {diff[:, c].max():.3e} / {np.abs(o[:, c]).max():.3e} '
          f'rel {diff[:, c].max() / scale[c]:.3e}')
rel = diff.max() / (np.abs(o).max() + 1e-8)
print(f'OVERALL stream-vs-slot rel: {rel:.3e}')
assert rel < 3e-4, 'stream backward disagrees with slot backward'
print('PASS')
