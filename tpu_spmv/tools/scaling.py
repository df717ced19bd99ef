"""Multi-chip scaling report: shard balance + interconnect traffic.

The reference has nothing distributed to compare against (SURVEY.md
§2.5); this reports what the TPU scaling layer will move per SpMV so
deployments can be sized before hardware is committed:

  * per-shard rows/nnz balance,
  * halo width the banded exchange needs (and whether it applies),
  * ICI bytes per device per SpMV: halo exchange (2 * halo * 4B) vs
    all-gather (n * (D-1)/D * 4B),
  * the weak-scaling traffic model: halo traffic is constant per device
    as D grows (bandwidth-limited scaling), all-gather grows with n.

Runs entirely on the host (no devices needed); validation of the
distributed schedule itself lives in tests/test_dist.py and the
driver's multi-chip dry run.

Usage: python -m tpu_spmv.tools.scaling matrix.csr --devices 8 [--rcm]
"""

from __future__ import annotations

import argparse
import sys

import numpy as np


def report(mat, n_devices: int) -> dict:
    from tpu_spmv.dist.sharding import ShardedSell, _round_up
    from tpu_spmv.formats.sell import LANES

    m, n = mat.shape
    rows_per_shard = _round_up(_round_up(m, n_devices) // n_devices, 8 * LANES)
    shard_nnz = []
    reach = 0
    for d in range(n_devices):
        r0 = min(d * rows_per_shard, m)
        r1 = min((d + 1) * rows_per_shard, m)
        shard_nnz.append(int(mat.indptr[r1] - mat.indptr[r0]))
        cs = mat.indices[mat.indptr[r0] : mat.indptr[r1]]
        if cs.size:
            reach = max(reach, int(r0 - cs.min()), int(int(cs.max()) + 1 - r1))
    halo_ok = reach <= rows_per_shard
    halo_rows = _round_up(max(reach, LANES), LANES) if halo_ok else 0
    halo_bytes = 2 * halo_rows * 4
    allgather_bytes = int(n * (n_devices - 1) / n_devices * 4)
    nnz_arr = np.asarray(shard_nnz, dtype=np.float64)
    return {
        "devices": n_devices,
        "rows_per_shard": rows_per_shard,
        "shard_nnz_min": int(nnz_arr.min()),
        "shard_nnz_max": int(nnz_arr.max()),
        "shard_nnz_imbalance": float(nnz_arr.max() / max(nnz_arr.mean(), 1)),
        "halo_applicable": halo_ok,
        "halo_rows": halo_rows,
        "ici_bytes_per_dev_halo": halo_bytes,
        "ici_bytes_per_dev_allgather": allgather_bytes,
        "halo_traffic_saving": (
            round(allgather_bytes / max(halo_bytes, 1), 1) if halo_ok else 1.0
        ),
    }


def main(argv=None):
    from tpu_spmv.tools.spmv import load_input

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("input")
    ap.add_argument("--devices", type=int, nargs="*", default=[2, 4, 8, 16])
    ap.add_argument("--rcm", action="store_true",
                    help="apply RCM first (halo width depends on it)")
    args = ap.parse_args(argv)

    mat = load_input(args.input)
    if args.rcm:
        from tpu_spmv.reorder import rcm

        mat = mat.permuted(rcm(mat.indptr, mat.indices))
    for d in args.devices:
        r = report(mat, d)
        print(
            f"D={r['devices']}: rows/shard {r['rows_per_shard']} "
            f"nnz imbalance {r['shard_nnz_imbalance']:.2f} | "
            + (
                f"halo {r['halo_rows']} rows -> "
                f"{r['ici_bytes_per_dev_halo']} B/dev over ICI "
                f"({r['halo_traffic_saving']}x less than all-gather)"
                if r["halo_applicable"]
                else f"all-gather {r['ici_bytes_per_dev_allgather']} B/dev "
                "(columns reach past neighbor shards)"
            )
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())
