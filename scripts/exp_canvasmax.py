"""A/B: vmapped drop-mode canvas scatter-max, flagged vs unflagged, at
production shapes (E=16, P=60k, C=128).  Both verified vs CPU first.

MEASURED (v5e, 2026-08-18): both EXACT vs CPU (drop-mode is not the
miscompiling emitter path — see exp_scatter_miscompile.py);
flagged 7.34 ms/iter vs unflagged 14.35 — the sorted flag is a real 2x
for mode='drop', so featurize() keeps it on the canvas emit, re-verified
every bench run by bench.py::numerics_guard."""
import numpy as np, sys
sys.path.insert(0, "/root/repo"); sys.path.insert(0, "/root/repo/scripts")
import jax, jax.numpy as jnp
from exp_scatter import device_ms

G, P, C, E = 320*320, 60000, 128, 16
rng = np.random.default_rng(2)
argsets = []
for _ in range(4):
    pid = np.sort(rng.integers(0, G + 1, (E, P)), axis=1).astype(np.int32)
    vals = rng.normal(size=(E, P, C)).astype(np.float32)
    argsets.append((jnp.asarray(pid), jnp.asarray(vals, jnp.bfloat16)))

def form(flag):
    def one(p, v):
        return jnp.zeros((G, C), v.dtype).at[p].max(
            v, mode="drop", indices_are_sorted=flag)
    return jax.jit(jax.vmap(one))

fa, fb = form(True), form(False)
ta = np.asarray(fa(*argsets[0]), np.float32)
tb = np.asarray(fb(*argsets[0]), np.float32)
with jax.default_device(jax.devices("cpu")[0]):
    ref = np.asarray(fb(*argsets[0]), np.float32)
print(f"flagged vs cpu: {np.abs(ta-ref).max():.4f}  unflagged vs cpu: {np.abs(tb-ref).max():.4f}")
device_ms(fa, argsets, label="drop-max flagged")
device_ms(fb, argsets, label="drop-max unflagged")
