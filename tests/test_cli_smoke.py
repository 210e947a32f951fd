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
def test_dicom_to_pretrain_full_chain(tmp_path):
    """The complete L0->L6 production chain on one host: raw DICOMs -> native
    GDCM decode + fused breast-crop/resize preprocess -> packed uint8 shards ->
    pretrain CLI on the 8-device mesh -> checkpoint round-trip through the eval
    loader. The reference runs this as three separate manual stages
    (data_prep/*.py, then pretraining, SURVEY.md L0-L2); here one test owns the
    whole contract so a format drift in any stage fails loudly."""
    from mammo_clip_tpu.preprocess import dicom_native as dn

    if not dn.dicom_available():
        pytest.skip("no GDCM toolchain")
    from mammo_clip_tpu.cli import pretrain
    from mammo_clip_tpu.core.config import tiny_test_config
    from mammo_clip_tpu.preprocess import dicom_tool

    # --- stage 1: raw 16-bit DICOMs (J2K lossless, the RSNA transfer syntax)
    rng = np.random.default_rng(0)
    in_dir = tmp_path / "dicoms"
    in_dir.mkdir()
    h_raw, w_raw = 120, 96
    yy, xx = np.mgrid[0:h_raw, 0:w_raw]
    breast = (xx / (w_raw * 0.6)) ** 2 + ((yy - h_raw / 2) / (h_raw * 0.45)) ** 2 < 1
    names = []
    for i in range(32):
        for view in ("cc", "mlo"):
            img = np.zeros((h_raw, w_raw), np.uint16)
            img[breast] = 20000 + rng.integers(0, 20000, breast.sum()).astype(np.uint16)
            name = f"p{i}_{view}"
            dn.write_dicom_u16(str(in_dir / f"{name}.dicom"), img, ts=dn.TS_J2K)
            names.append(name)

    # --- stage 2: native decode -> breast crop -> packed shards at model size
    shards = tmp_path / "shards"
    dicom_tool.main([
        "--in-dir", str(in_dir), "--out-dir", str(shards),
        "--height", "64", "--width", "64",
    ])
    from mammo_clip_tpu.data.images import PackedShardStore

    store = PackedShardStore(str(shards))
    assert all(n in store for n in names)

    # --- stage 3: pretrain CSV referencing the shard image_ids
    rows = []
    for i in range(32):
        cc, mlo = f"p{i}_cc", f"p{i}_mlo"
        rows.append({
            "patient_id": f"p{i}", "laterality": "L",
            "image": str([cc, mlo]), "view": str(["CC", "MLO"]),
            "CC": str([cc]), "MLO": str([mlo]),
            "text": str([f"there is a mass in sample {i}.", f"impression {i}."]),
            "text_augment": str([f"a mass in sample {i}.", f"imp {i}."]),
            "fold": i % 4,
        })
    csv = str(tmp_path / "train.csv")
    pd.DataFrame(rows).to_csv(csv, index=False)

    cfg = tiny_test_config()
    cfg.scheduler.update(epochs=1, warmup_epochs=0)
    cfg.data["train"] = [{"csv": csv, "image_dir": str(shards), "data_type": "imagetext"}]
    cfg.data["valid"] = [{"csv": csv, "image_dir": str(shards), "data_type": "imagetext"}]
    cfg.data.batch_size_per_device = 1
    cfg_path = str(tmp_path / "cfg.yaml")
    with open(cfg_path, "w") as f:
        yaml.safe_dump(cfg.to_dict(), f)

    # --- stage 4: train + checkpoint + eval-loader round trip
    workdir = str(tmp_path / "run")
    pretrain.main(["--config", cfg_path, "--workdir", workdir])
    assert os.path.isdir(os.path.join(workdir, "best"))
    with open(os.path.join(workdir, "metrics.jsonl")) as f:
        metrics = [json.loads(l) for l in f]
    assert any(m.get("prefix") == "valid" for m in metrics)
    losses = [v for m in metrics for k, v in m.items() if k.startswith("loss")]
    assert losses and all(np.isfinite(v) for v in losses)

    from mammo_clip_tpu.eval.loading import load_clip_for_eval
    from mammo_clip_tpu.eval.embeddings import EmbeddingExtractor

    model, variables, loaded_cfg = load_clip_for_eval(os.path.join(workdir, "best"))
    extractor = EmbeddingExtractor(model, variables, loaded_cfg.data.mean,
                                   loaded_cfg.data.std, batch_size=4)
    # embed straight from the shard store the preprocessing stage produced
    emb = extractor.encode_images(store.get_rows(names[:8])[..., None])
    assert emb.shape == (8, cfg.model.projection_head.proj_dim)
    assert np.all(np.isfinite(emb))


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
