"""Detector CLI (reference: src/codebase/train_detector.py:14-125).

    python -m mammo_clip_tpu.cli.detector --clip-checkpoint <ckpt> \
        --csv vindr_detection_folds.csv --image-dir <pngs|shards> \
        [--resize 512] [--epochs 120] [--freeze-backbone] ...

Boxes come from the resized_{x,y}{min,max} columns produced by the preprocessing
remap (reference preprocess_VinDr_detector.py), padded to (max_n, 5) with -1 rows
(reference dataset_concepts.py:185-205). Training uses Adam + grad-clip 0.1, focal
alpha/gamma 0.25/2.0; eval is VOC mAP@0.5 (reference Detectors/experiments.py).
"""

from __future__ import annotations

import argparse
import json

import jax
import jax.numpy as jnp
import numpy as np

from ..data.images import open_image_store
from ..data.metadata import load_metadata, split_dataframe
from ..downstream.detect import VINDR_DETECTION_CLASSES, evaluate_map
from ..downstream.experiments import make_detector_steps
from ..eval.loading import load_clip_for_eval
from ..models.retinanet import RetinaNet, anchors_for, detect
from ..ops.augment import AugmentConfig, augment_batch
from ..train.checkpoint import save_checkpoint
from ..train.optim import build_optimizer
from ..train.state import TrainState
from ..utils.cache import enable_compile_cache


def build_detection_table(df, classes, image_col="image_id", max_boxes=16):
    """Group per-image box rows into padded (max_n, 5) annotation arrays."""
    cls_index = {c: i for i, c in enumerate(classes)}
    ann = {}
    for _, r in df.iterrows():
        img = str(r[image_col])
        cats = r.get("finding_categories")
        cats = cats if isinstance(cats, list) else [cats]
        for cat in cats:
            if cat not in cls_index:
                continue
            box = [r.get("resized_xmin", r.get("xmin")), r.get("resized_ymin", r.get("ymin")),
                   r.get("resized_xmax", r.get("xmax")), r.get("resized_ymax", r.get("ymax")),
                   cls_index[cat]]
            ann.setdefault(img, []).append([float(v) for v in box])
    table = {}
    for img, boxes in ann.items():
        arr = -np.ones((max_boxes, 5), np.float32)
        arr[: min(len(boxes), max_boxes)] = np.asarray(boxes[:max_boxes], np.float32)
        table[img] = arr
    return table


def main(argv=None) -> None:
    enable_compile_cache()
    ap = argparse.ArgumentParser()
    ap.add_argument("--clip-checkpoint", required=True)
    ap.add_argument("--csv", required=True)
    ap.add_argument("--image-dir", required=True)
    ap.add_argument("--resize", type=int, default=512)
    ap.add_argument("--epochs", type=int, default=120)
    ap.add_argument("--batch-size", type=int, default=7)
    ap.add_argument("--lr", type=float, default=1e-4)
    ap.add_argument("--focal-alpha", type=float, default=0.25)
    ap.add_argument("--focal-gamma", type=float, default=2.0)
    ap.add_argument("--score-threshold", type=float, default=0.2)
    ap.add_argument("--freeze-backbone", action="store_true")
    ap.add_argument("--eval-scales", type=lambda v: [float(x) for x in v.split(",")],
                    default=None, help="multi-scale eval, e.g. 0.75,1.0,1.25: run "
                    "the detector at each scale and merge candidates in ONE NMS")
    ap.add_argument("--soft-nms", action="store_true",
                    help="gaussian soft-NMS at eval (score decay instead of kill)")
    ap.add_argument("--resume", action="store_true",
                    help="resume from workdir/checkpoints (the 120-epoch recipe "
                    "is preemption-exposed without it)")
    ap.add_argument("--workdir", default="outputs/detector")
    args = ap.parse_args(argv)

    clip_model, clip_vars, clip_cfg = load_clip_for_eval(args.clip_checkpoint)
    H = W = args.resize
    classes = VINDR_DETECTION_CLASSES
    model = RetinaNet(
        image_encoder_config=dict(clip_cfg.model.image_encoder),
        num_classes=len(classes),
        freeze_backbone=args.freeze_backbone,
        dtype=jnp.bfloat16,
    )
    variables = jax.jit(
        lambda: model.init({"params": jax.random.PRNGKey(0)}, jnp.zeros((1, H, W, 1)), train=False)
    )()
    params = dict(variables["params"])
    params["image_encoder"] = clip_vars["params"]["image_encoder"]
    batch_stats = dict(variables.get("batch_stats", {}))
    if "image_encoder" in clip_vars.get("batch_stats", {}):
        batch_stats["image_encoder"] = clip_vars["batch_stats"]["image_encoder"]

    df = load_metadata(args.csv, parse_lists=True)
    train_df = split_dataframe(df, "train")
    valid_df = split_dataframe(df, "valid")
    store = open_image_store(args.image_dir, (H, W))
    train_tab = build_detection_table(train_df, classes)
    valid_tab = build_detection_table(valid_df, classes)

    anchors = anchors_for((H, W))
    mean, std = clip_cfg.data.mean, clip_cfg.data.std
    # box-aware augmentation matching the reference detector recipe — flips,
    # Affine(rotate 20, translate 0.1, scale 0.8-1.2, shear 20), Elastic(10, 15)
    # (reference: Datasets/dataset_utils.py:59-66, train_detector.py:48-49), with
    # box corners mapped analytically through the SAME affine+elastic transform
    aug = AugmentConfig(hflip_p=0.5, vflip_p=0.5, affine_p=0.5, rotate_deg=20.0,
                        translate_frac=0.1, scale_min=0.8, scale_max=1.2,
                        shear_deg=20.0, elastic_p=0.5, elastic_alpha=10.0,
                        elastic_sigma=15.0)

    def preprocess(batch, rng):
        batch = dict(batch)
        if rng is None:
            batch["images"] = augment_batch(batch["images"], None, aug, mean, std, train=False)
            return batch
        from ..ops.augment import augment_batch_with_boxes

        batch["images"], batch["annotations"] = augment_batch_with_boxes(
            batch["images"], batch["annotations"], rng, aug, mean, std, train=True
        )
        return batch

    tx = build_optimizer({"name": "adam", "lr": args.lr, "grad_clip_norm": 0.1}, lambda s: args.lr)
    state = TrainState(step=jnp.asarray(0, jnp.int32), params=params,
                       batch_stats=batch_stats, opt_state=tx.init(params), tx=tx)
    train_step, infer_step, infer_multiscale = make_detector_steps(
        model, anchors, preprocess, alpha=args.focal_alpha, gamma=args.focal_gamma
    )

    def batches(tab, bs, shuffle, seed=0):
        ids = sorted(tab)
        order = np.arange(len(ids))
        if shuffle:
            np.random.default_rng(seed).shuffle(order)
        for i in range(0, len(ids) - bs + 1, bs):
            sel = [ids[int(j)] for j in order[i : i + bs]]
            yield {
                "images": jnp.asarray(np.stack([store.get("", s) for s in sel])[..., None]),
                "annotations": jnp.asarray(np.stack([tab[s] for s in sel])),
                "ids": sel,
            }

    best_map = -1.0
    start_epoch = 0
    if args.resume:
        from ..train.checkpoint import latest_step, restore_checkpoint

        ckpt_dir = f"{args.workdir}/checkpoints"
        if latest_step(ckpt_dir) is not None:
            state, _, meta = restore_checkpoint(ckpt_dir, state)
            state = jax.tree_util.tree_map(
                lambda a: np.asarray(a) if isinstance(a, jax.Array) else a, state)
            start_epoch = int(meta.get("epoch", 0))
            best_map = float(meta.get("best_mAP", -1.0))
            print(f"resumed detector at epoch {start_epoch} (best mAP {best_map:.4f})")
    for epoch in range(start_epoch, args.epochs):
        for batch in batches(train_tab, args.batch_size, True, seed=epoch):
            state, ld = train_step(
                state,
                {k: v for k, v in batch.items() if k != "ids"},
                jax.random.PRNGKey(epoch),
            )
        dets, anns = [], []
        for batch in batches(valid_tab, args.batch_size, False):
            data = {k: v for k, v in batch.items() if k != "ids"}
            if args.eval_scales:
                d = infer_multiscale(state, data, scales=tuple(args.eval_scales),
                                     nms="soft" if args.soft_nms else "hard")
            else:
                out = infer_step(state, data)
                d = detect(out, jnp.asarray(anchors), (H, W), score_threshold=0.05,
                           nms="soft" if args.soft_nms else "hard")
            for i in range(len(batch["ids"])):
                dets.append({k: np.asarray(v[i]) for k, v in d.items()})
                anns.append(np.asarray(batch["annotations"][i]))
        res = evaluate_map(dets, anns, len(classes), score_threshold=args.score_threshold,
                           class_names=classes)
        print(f"epoch {epoch + 1}: mAP={res['mAP']:.4f}")
        if res["mAP"] > best_map:
            best_map = res["mAP"]
            # persist the validation detections for offline re-scoring
            # (reference keeps predictions in its best checkpoints,
            # Classifiers/experiments.py:193-222 / Detectors inference loop)
            det_arrays = {k: np.stack([d[k] for d in dets])
                          for k in ("boxes", "scores", "classes", "valid")}
            det_arrays["annotations"] = np.stack(anns)
            save_checkpoint(f"{args.workdir}/best", state,
                            config={"classes": classes, "resize": args.resize},
                            extra_meta={"mAP": best_map}, max_to_keep=1,
                            extra_arrays=det_arrays)
        save_checkpoint(f"{args.workdir}/checkpoints", state, step=epoch + 1,
                        config={"classes": classes, "resize": args.resize},
                        extra_meta={"epoch": epoch + 1, "best_mAP": float(best_map)},
                        max_to_keep=1)
    print(json.dumps({"best_mAP": best_map}))


if __name__ == "__main__":
    main()
