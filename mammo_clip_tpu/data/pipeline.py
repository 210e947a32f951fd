"""Input pipeline: host batching -> double-buffered device prefetch.

Replaces the reference's torch DataLoader (+DistributedSampler) stack
(reference: datamodule.py:104-131). The reference ships with num_workers=0
(configs/dataloader/dataloader_b5.yaml:5), i.e. imread + albumentations + tokenize run
synchronously between optimizer steps — the known throughput killer (SURVEY.md §3.1).

TPU-native layout:
* static shapes everywhere: fixed batch size (drop_last), fixed token length;
* the host only stacks uint8 images and tokenizes; augmentation/normalization are
  compiled into the train step (ops/augment.py);
* ``prefetch_to_device`` runs the host work in a background thread and keeps
  ``depth`` batches resident in HBM (sharded over the mesh), so the device never waits
  on the host after step 1;
* multi-host SPMD: each process enumerates only the index slice for its addressable
  shard (process_index-strided), and ``MeshContext.shard_host_batch`` assembles the
  global array — the jax equivalent of DistributedSampler without a sampler object.
"""

from __future__ import annotations

import queue
import threading
from typing import Callable, Dict, Iterator, Optional

import jax
import numpy as np


class Batcher:
    """Deterministic, seeded batch iterator over a host dataset.

    dataset: mapping-style with __len__/__getitem__ returning dicts with
    'image' (H,W uint8), optional 'image_view', 'text'/'text2' strings or 'label'.
    """

    def __init__(
        self,
        dataset,
        tokenizer,
        batch_size: int,
        max_length: int = 256,
        shuffle: bool = True,
        seed: int = 0,
        drop_last: bool = True,
        sample_weights=None,
        process_index: Optional[int] = None,
        process_count: Optional[int] = None,
    ):
        self.dataset = dataset
        self.tokenizer = tokenizer
        self.batch_size = batch_size
        self.max_length = max_length
        self.shuffle = shuffle
        self.seed = seed
        self.drop_last = drop_last
        # class-balanced sampling with replacement, the reference's
        # WeightedRandomSampler option (Datasets/dataset_utils.py:147-165)
        self.sample_weights = None if sample_weights is None else np.asarray(sample_weights, np.float64)
        self.process_index = jax.process_index() if process_index is None else process_index
        self.process_count = jax.process_count() if process_count is None else process_count
        self.epoch = 0

    def set_epoch(self, epoch: int) -> None:
        self.epoch = epoch
        if hasattr(self.dataset, "reseed"):
            self.dataset.reseed(epoch)

    def __len__(self) -> int:
        n = len(self.dataset) // self.process_count
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def _indices(self) -> np.ndarray:
        n = len(self.dataset)
        rng = np.random.default_rng(self.seed * 100_003 + self.epoch)
        if self.sample_weights is not None:
            p = self.sample_weights / self.sample_weights.sum()
            order = rng.choice(n, size=n, replace=True, p=p)
        else:
            order = np.arange(n)
            if self.shuffle:
                rng.shuffle(order)
        return order[self.process_index :: self.process_count]

    def _collate(self, items) -> Dict[str, np.ndarray]:
        batch: Dict[str, np.ndarray] = {}
        batch["images"] = np.stack([it["image"] for it in items])[..., None]
        if "image_view" in items[0]:
            batch["image_views"] = np.stack([it["image_view"] for it in items])[..., None]
        if "text" in items[0]:
            enc = self.tokenizer([it["text"] for it in items], max_length=self.max_length)
            batch["input_ids"] = enc["input_ids"]
            batch["attention_mask"] = enc["attention_mask"]
        if "text2" in items[0]:
            enc2 = self.tokenizer([it["text2"] for it in items], max_length=self.max_length)
            batch["input_ids2"] = enc2["input_ids"]
            batch["attention_mask2"] = enc2["attention_mask"]
        if "label" in items[0]:
            batch["labels"] = np.asarray([it["label"] for it in items])
        return batch

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        idx = self._indices()
        bs = self.batch_size
        n_full = len(idx) // bs
        for b in range(n_full):
            items = [self.dataset[int(i)] for i in idx[b * bs : (b + 1) * bs]]
            yield self._collate(items)
        if not self.drop_last and len(idx) % bs:
            items = [self.dataset[int(i)] for i in idx[n_full * bs :]]
            yield self._collate(items)


def stack_batches(batches) -> Dict[str, np.ndarray]:
    """Stack K same-shape host batches along a new leading steps axis.

    Produces the input of :func:`mammo_clip_tpu.train.step.make_train_multistep`
    (the fused K-step train call): every leaf goes from ``(B, ...)`` to
    ``(K, B, ...)``. Host-side ``np.stack`` so the device sees ONE transfer per
    K steps instead of K.
    """
    keys = batches[0].keys()
    assert all(b.keys() == keys for b in batches), "batches must share keys"
    return {k: np.stack([np.asarray(b[k]) for b in batches]) for k in keys}


def group_batches(batches, k: int):
    """Yield lists of ``k`` consecutive batches, dropping the final partial
    group (keeps the fused multi-step call shape-static; the trainer accounts
    for the dropped tail in its schedule horizon)."""
    buf = []
    for b in batches:
        buf.append(b)
        if len(buf) == k:
            yield buf
            buf = []


def prefetch_to_device(batches, mesh_ctx=None, depth: int = 2, stacked: bool = False):
    """Wrap a host batch iterator with a background thread + HBM double buffering.

    Yields device-resident (sharded when mesh_ctx given) batches. ``depth`` bounds how
    many batches are in flight, overlapping host IO/tokenization with device compute.
    stacked=True: batches carry a leading (K,) steps axis (stack_batches) — the
    mesh shards axis 1 (batch) and replicates the steps axis.
    """
    q: "queue.Queue" = queue.Queue(maxsize=depth)
    sentinel = object()
    err: list = []

    def put(batch):
        if mesh_ctx is not None:
            return mesh_ctx.shard_host_batch(batch, stacked=stacked)
        return jax.tree_util.tree_map(jax.device_put, batch)

    def worker():
        try:
            for b in batches:
                q.put(put(b))
        except Exception as e:  # surfaced on the consumer side
            err.append(e)
        finally:
            q.put(sentinel)

    t = threading.Thread(target=worker, daemon=True)
    t.start()
    while True:
        item = q.get()
        if item is sentinel:
            if err:
                raise err[0]
            return
        yield item
