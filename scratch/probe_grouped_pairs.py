"""Probe: does a grouped kernel with npairs=2 compile in reasonable time
at small scale? (Large-scale W=4/8 grouped never finished; gate is at
rank_nb<=2. If small compiles fast, the pathology scales with S.)"""
import sys, time
import numpy as np, jax, jax.numpy as jnp
from tpu_spmv.bench.matrices import random_general
from tpu_spmv.formats.sell import RankedSlabs
import tpu_spmv.formats.sell as sellmod
from tpu_spmv.kernels.pallas_sell import spmv_ranked

# Bypass the rank>2 gate to build a grouped W=4 layout.
orig = RankedSlabs.from_csr.__func__
mat = random_general(4000, 8, seed=2)
lay = RankedSlabs.from_csr(mat, bin_blocks=4, allow_groups=False)
# Manually re-run with gate off by patching: temporarily widen the gate.
import tpu_spmv.formats.sell as S
src_gate = None
# Easiest: monkeypatch the rank gate constant via building with a fake:
# rebuild inline with allow_groups and no gate by editing the instance:
# (we re-create grouping manually: groups identity G=8, absolute bases)
import numpy as np
sub_b0 = np.asarray(lay.sub_b0)
dlo = np.asarray(lay.sub_dlo).view(np.uint32)
dhi = np.asarray(lay.sub_dhi).view(np.uint32)
Snum = lay.num_subtiles
gmat = np.empty((8, Snum), np.int64)
for r in range(4):
    gmat[r] = sub_b0 + ((dlo >> (8 * r)) & 255)
    gmat[r + 4] = sub_b0 + ((dhi >> (8 * r)) & 255)
code = 8 << 32
for r in range(8):
    code |= r << (4 * r)
gmat = gmat.T.copy()  # sub-tile-major, matching from_csr / the kernel
lay2 = RankedSlabs(
    vals=lay.vals, lcols=lay.lcols, sub_b0=lay.sub_b0, sub_dlo=lay.sub_dlo,
    sub_dhi=lay.sub_dhi, sub_chunk=lay.sub_chunk, tile_b0=lay.tile_b0,
    m=lay.m, n=lay.n, nnz=lay.nnz, num_chunks=lay.num_chunks,
    rank_nb=lay.rank_nb, chunk_q=lay.chunk_q, win_w=lay.win_w,
    tile_k=lay.tile_k, grp_b0=jnp.asarray(gmat.reshape(-1).astype(np.int32)),
    group_code=code,
)
x = jnp.asarray(np.random.default_rng(0).standard_normal(mat.n).astype(np.float32))
y_ref = mat.matvec(np.asarray(x))
for name, l in [("packed", lay), ("grouped", lay2)]:
    t0 = time.perf_counter()
    y = np.asarray(spmv_ranked(l, x))
    dt = time.perf_counter() - t0
    rel = np.linalg.norm(y - y_ref) / np.linalg.norm(y_ref)
    print(f"{name}: first-call {dt:.1f}s rel={rel:.1e} rank_nb={l.rank_nb} S={l.num_subtiles}",
          file=sys.stderr, flush=True)
