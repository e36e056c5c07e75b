import time; t0=time.monotonic()
import numpy as np
import jax, jax.numpy as jnp
from rav1e_tpu.device import pallas_kernels as pk

def satd8_jnp(diff):
    *lead, sh, sw = diff.shape
    d = diff.astype(jnp.float32).reshape(*lead, sh // 8, 8, sw // 8, 8)
    d = jnp.moveaxis(d, -2, -3)
    h = np.array([[1.0]], dtype=np.float32)
    while h.shape[0] < 8:
        h = np.block([[h, h], [h, -h]])
    t = jnp.einsum("ij,...jk,kl->...il", jnp.asarray(h), d, jnp.asarray(h))
    cells = jnp.abs(t).sum(axis=(-1, -2))
    return jnp.floor((cells + 4.0) / 8.0).sum(axis=(-1, -2))

print('pallas_ok', pk.pallas_ok(), time.monotonic()-t0, flush=True)
rng = np.random.default_rng(0)
d = jnp.asarray(rng.integers(-255,256,(960,13,16,16)),dtype=jnp.int32)
r = np.asarray(pk.satd8(d))
print('satd8 pallas done', r.shape, time.monotonic()-t0, flush=True)
r2 = np.asarray(satd8_jnp(d))
print('satd parity', np.array_equal(r, r2), flush=True)
n, blk, R, step = 960, 16, 3, 2
W = blk + 2*R*step
src = jnp.asarray(rng.integers(0,256,(n,blk,blk)),dtype=jnp.int32)
win = jnp.asarray(rng.integers(0,256,(n,W,W)),dtype=jnp.int32)
g = np.asarray(pk.sad_grid(src, win, blk, R, step))
ref = np.stack([np.abs(np.asarray(win)[:, oy*step:oy*step+blk, ox*step:ox*step+blk]-np.asarray(src)).sum(axis=(1,2)) for oy in range(2*R+1) for ox in range(2*R+1)], axis=1)
print('sad parity', np.array_equal(g, ref), time.monotonic()-t0, flush=True)
import timeit
d2 = jnp.asarray(rng.integers(-255,256,(9600,13,16,16)),dtype=jnp.int32)
f_p = jax.jit(lambda x: pk.satd8(x))
f_j = jax.jit(satd8_jnp)
_ = np.asarray(f_p(d2)); _ = np.asarray(f_j(d2))
tp = min(timeit.repeat(lambda: np.asarray(f_p(d2)), number=3, repeat=3))/3
tj = min(timeit.repeat(lambda: np.asarray(f_j(d2)), number=3, repeat=3))/3
print(f'satd pallas {tp*1e3:.2f} ms vs jnp {tj*1e3:.2f} ms, speedup {tj/tp:.2f}x', flush=True)
# sad timing: pallas vs jnp slice-reduce form
def sad_jnp(src, win):
    cols = [jnp.abs(win[:, oy*step:oy*step+blk, ox*step:ox*step+blk]-src).sum(axis=(1,2)) for oy in range(2*R+1) for ox in range(2*R+1)]
    return jnp.stack(cols, axis=1)
n2 = 9600
src2 = jnp.asarray(rng.integers(0,256,(n2,blk,blk)),dtype=jnp.int32)
win2 = jnp.asarray(rng.integers(0,256,(n2,W,W)),dtype=jnp.int32)
g_p = jax.jit(lambda a,b: pk.sad_grid(a,b,blk,R,step))
g_j = jax.jit(sad_jnp)
_ = np.asarray(g_p(src2,win2)); _ = np.asarray(g_j(src2,win2))
tp = min(timeit.repeat(lambda: np.asarray(g_p(src2,win2)), number=3, repeat=3))/3
tj = min(timeit.repeat(lambda: np.asarray(g_j(src2,win2)), number=3, repeat=3))/3
print(f'sad pallas {tp*1e3:.2f} ms vs jnp {tj*1e3:.2f} ms, speedup {tj/tp:.2f}x', flush=True)
