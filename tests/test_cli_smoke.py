"""CLI smoke tests on synthetic data: the modern analogue of the reference's
'--running-interactive' sanity mode (SURVEY.md §4)."""

import json
import os

import numpy as np
import pandas as pd
import pytest
import yaml


def _write_pretrain_csv(path, n=16):
    rows = []
    for i in range(n):
        rows.append(
            {
                "patient_id": f"p{i}",
                "laterality": "L",
                "image": str([f"i{i}a.png", f"i{i}b.png"]),
                "view": str(["CC", "MLO"]),
                "CC": str([f"i{i}a.png"]),
                "MLO": str([f"i{i}b.png"]),
                "text": str([f"there is a mass in sample {i}.", f"impression {i}."]),
                "text_augment": str([f"a mass in sample {i}.", f"imp {i}."]),
                "fold": i % 4,
            }
        )
    pd.DataFrame(rows).to_csv(path, index=False)


@pytest.mark.slow
def test_pretrain_cli_end_to_end(tmp_path):
    from mammo_clip_tpu.cli import pretrain
    from mammo_clip_tpu.core.config import tiny_test_config

    csv = str(tmp_path / "train.csv")
    # 32 rows: fold==0 leaves 8 valid rows = one full global batch on the 8-dev mesh
    _write_pretrain_csv(csv, n=32)
    cfg = tiny_test_config()
    cfg.scheduler.update(epochs=1, warmup_epochs=0)
    cfg.data["train"] = [{"csv": csv, "image_dir": "synthetic://", "data_type": "imagetext"}]
    cfg.data["valid"] = [{"csv": csv, "image_dir": "synthetic://", "data_type": "imagetext"}]
    cfg.data.batch_size_per_device = 1  # 8 devices -> global batch 8
    cfg_path = str(tmp_path / "cfg.yaml")
    with open(cfg_path, "w") as f:
        yaml.safe_dump(cfg.to_dict(), f)

    workdir = str(tmp_path / "run")
    pretrain.main(["--config", cfg_path, "--workdir", workdir])

    assert os.path.isdir(os.path.join(workdir, "checkpoints"))
    assert os.path.isdir(os.path.join(workdir, "best"))

    # the saved checkpoint round-trips through the eval loader (embedded config)
    from mammo_clip_tpu.eval.loading import load_clip_for_eval

    model, variables, loaded_cfg = load_clip_for_eval(workdir.replace("run", "run") + "/best")
    assert loaded_cfg.model.image_encoder.name == cfg.model.image_encoder.name

    # and supports embedding extraction + zero-shot scoring end to end
    from mammo_clip_tpu.data.tokenizer import HashTokenizer
    from mammo_clip_tpu.eval.embeddings import EmbeddingExtractor
    from mammo_clip_tpu.eval.zeroshot import eval_zeroshot

    extractor = EmbeddingExtractor(model, variables, loaded_cfg.data.mean,
                                   loaded_cfg.data.std, batch_size=4)
    rng = np.random.default_rng(0)
    imgs = rng.integers(0, 255, (8, cfg.data.image_size_h, cfg.data.image_size_w, 1), dtype=np.uint8)
    emb = extractor.encode_images(imgs)
    assert emb.shape == (8, cfg.model.projection_head.proj_dim)
    tok = HashTokenizer(vocab_size=cfg.model.text_encoder.vocab_size)
    res = eval_zeroshot(extractor, tok, emb, {"mass": rng.integers(0, 2, 8)},
                        {"mass": ["no mass", "mass"]}, max_length=8)
    assert "mass" in res and 0.0 <= res["mass"] <= 1.0
