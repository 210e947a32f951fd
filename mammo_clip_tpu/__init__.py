"""mammo_clip_tpu — a TPU-native (JAX/XLA/Pallas/pjit) vision-language framework for
screening mammography, providing the full capability surface of batmanlab/Mammo-CLIP
(reference mounted at /root/reference) re-designed TPU-first.

Subpackages
-----------
core        config system, mesh/distributed context, PRNG plumbing
ops         TPU compute primitives: same-padding convs, GeM pooling, fused on-device
            augmentation, shape-static NMS, box coding, resize
models      Flax model zoo: EfficientNet-B0..B7, BERT text encoder, projection heads,
            MammoCLIP dual encoder, classifiers, RetinaNet detector
losses      multi-positive symmetric InfoNCE (global-batch negatives), contrastive,
            BCE classification, focal loss
parallel    mesh construction, partitioning rules, shard_map loss variants
data        CSV metadata layer, datasets, tokenizer, prompt/report generation,
            host->HBM double-buffered input pipeline
train       optax schedules, TrainState, pjit train step, Orbax checkpointing, trainer
eval        metrics (AUROC/AUPRC/pF1), zero-shot prompt eval, image-text retrieval
downstream  linear-probe / full-finetune classification, RetinaNet detection
interpret   Mammo-FActOR region-to-sentence mapper
convert     reference torch .tar checkpoint -> Flax params importer
preprocess  offline DICOM -> packed-shard tooling (breast-ROI crop, resize)
"""

__version__ = "0.1.0"
