"""Host-side input-pipeline throughput: packed-shard reads + full collate.

Measures what the single host core can feed (images/sec) at the production
resolution — the number that bounds multi-host scaling decisions (BASELINE.md).
Synthetic shards are written to a temp dir; reads go through the mmap'd
PackedShardStore exactly as training does.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    from mammo_clip_tpu.data.images import PackedShardStore
    from mammo_clip_tpu.data.pipeline import Batcher
    from mammo_clip_tpu.data.tokenizer import HashTokenizer
    from mammo_clip_tpu.preprocess.shard_writer import write_packed_shards

    h, w = 1520, 912
    n = 64
    rng = np.random.default_rng(0)
    tmp = tempfile.mkdtemp(prefix="shard_bench_")
    ids = [f"img{i}" for i in range(n)]
    write_packed_shards(
        [(k, k) for k in ids], tmp, (h, w), shard_size=16,
        loader=lambda _: rng.integers(0, 255, (h, w), dtype=np.uint8),
    )
    store = PackedShardStore(tmp)

    # raw mmap'd row reads (copies), random order
    order = rng.permutation(n)
    t0 = time.perf_counter()
    reps = 4
    for _ in range(reps):
        for i in order:
            _ = store.get("", ids[int(i)])
    dt = time.perf_counter() - t0
    raw_ips = reps * n / dt

    # full Batcher path: two views + two texts per sample (the CLIP collate)
    class Ds:
        def __len__(self):
            return n

        def __getitem__(self, i):
            img = store.get("", ids[int(i)])
            return {"image": img, "image_view": img,
                    "text": f"finding in sample {i}", "text2": f"impression {i}"}

    b = Batcher(Ds(), HashTokenizer(vocab_size=28996), batch_size=8, max_length=256,
                process_index=0, process_count=1)
    t0 = time.perf_counter()
    n_imgs = 0
    for _ in range(2):
        for batch in b:
            n_imgs += batch["images"].shape[0] * 2  # two views
    collate_ips = n_imgs / (time.perf_counter() - t0)

    print(json.dumps({
        "resolution": f"{h}x{w}",
        "raw_shard_reads_per_sec": round(raw_ips, 1),
        "clip_collate_images_per_sec": round(collate_ips, 1),
    }))


if __name__ == "__main__":
    main()
