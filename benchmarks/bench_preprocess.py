"""Offline DICOM->shard conversion throughput (host-side, no TPU).

Measures the native decode+preprocess path at production image sizes:
- serial: dicom_tool.convert_one per file (GDCM decode + fused native
  normalize/crop/INTER_AREA resize)
- pool: dicom_batch_preprocess (mammo_pool.cpp) at 1..N threads

Context: the reference's RSNA conversion used NVIDIA DALI's GPU JPEG2000 stage
(preprocess_image_to_png_kaggle.py:95-100); ours is an all-CPU C++ pool whose
throughput scales with host cores (this pod has one — the pool exists for the
production multi-core hosts; see BASELINE.md).

    python benchmarks/bench_preprocess.py [--n 24] [--rows 2800 --cols 2300]
"""

import argparse
import json
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=24, help="DICOMs per timing run")
    ap.add_argument("--rows", type=int, default=2800, help="raw DICOM rows (RSNA-scale)")
    ap.add_argument("--cols", type=int, default=2300)
    ap.add_argument("--out-h", type=int, default=1520)
    ap.add_argument("--out-w", type=int, default=912)
    ap.add_argument("--threads", type=int, nargs="*", default=None,
                    help="thread counts to sweep (default: 1, 2, ..., cores)")
    args = ap.parse_args()

    from mammo_clip_tpu.preprocess import dicom_native as dn
    from mammo_clip_tpu.preprocess import dicom_tool

    assert dn.pool_available(), "native DICOM pool unavailable"
    cores = os.cpu_count() or 1
    sweep = args.threads or sorted({1, 2, cores, max(1, cores // 2)})

    rng = np.random.default_rng(0)
    h, w = args.rows, args.cols
    yy, xx = np.mgrid[0:h, 0:w]
    breast = (xx / (w * 0.6)) ** 2 + ((yy - h / 2) / (h * 0.45)) ** 2 < 1

    with tempfile.TemporaryDirectory() as td:
        paths = []
        for i in range(args.n):
            img = np.zeros((h, w), np.uint16)
            img[breast] = 15000 + rng.integers(0, 25000, int(breast.sum())).astype(np.uint16)
            p = os.path.join(td, f"case{i}.dicom")
            dn.write_dicom_u16(p, img, ts=dn.TS_J2K)
            paths.append(p)
        size_mb = sum(os.path.getsize(p) for p in paths) / 1e6

        out_size = (args.out_h, args.out_w)
        t0 = time.perf_counter()
        for p in paths:
            dicom_tool.convert_one(p, out_size)
        serial_s = time.perf_counter() - t0

        results = {"host_cores": cores, "n": args.n,
                   "raw_shape": [h, w], "out_shape": [args.out_h, args.out_w],
                   "j2k_mb_total": round(size_mb, 1),
                   "serial_img_per_s": round(args.n / serial_s, 2)}
        for t in sweep:
            t0 = time.perf_counter()
            _, _, status = dn.batch_preprocess(paths, out_size, n_threads=t)
            dt = time.perf_counter() - t0
            assert int(status.sum()) == 0
            results[f"pool_t{t}_img_per_s"] = round(args.n / dt, 2)
        print(json.dumps(results))


if __name__ == "__main__":
    main()
