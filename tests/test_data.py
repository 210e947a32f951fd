"""Data layer tests: prompt bank + report generation, tokenizers, datasets, batcher,
device prefetch."""

import numpy as np
import pandas as pd
import pytest

from mammo_clip_tpu.data.datasets import (
    ImageClassificationDataset,
    ImageTextDataset,
    ImageTextRetrievalDataset,
    load_dataset,
)
from mammo_clip_tpu.data.images import SyntheticImageStore, open_image_store
from mammo_clip_tpu.data.metadata import load_metadata, parse_list_cell, split_dataframe
from mammo_clip_tpu.data.pipeline import Batcher, prefetch_to_device
from mammo_clip_tpu.data.prompts import (
    VINDR_FINDINGS,
    build_prompt_bank,
    generate_report_from_labels,
)
from mammo_clip_tpu.data.tokenizer import HashTokenizer, WordPieceTokenizer


# ---------------------------------------------------------------- prompts


def test_prompt_bank_covers_all_findings():
    bank = build_prompt_bank()
    assert set(bank) == set(VINDR_FINDINGS)
    for f in VINDR_FINDINGS:
        assert bank[f]["pos_right"], f
        if f != "No Finding":
            assert bank[f]["neg_left"], f
    # combinatorial sizes: qualifiers x regions x depths
    assert len(bank["Mass"]["pos_right"]) == 10 * 10 * 4
    assert len(bank["Suspicious Calcification"]["pos_left"]) == 36 * 10 * 4
    # sides are actually distinct
    assert "right" in bank["Mass"]["pos_right"][5]
    assert "left" in bank["Mass"]["pos_left"][5]


def test_generate_report_no_finding_suppresses_negatives():
    bank = build_prompt_bank()
    findings = [["No Finding"], [], ["Mass"], ["Mass"]]
    report = generate_report_from_labels(findings, bank, deterministic=True)
    assert "no mammographic evidence" in report
    assert "there is no suspicious mass" not in report  # negatives suppressed


def test_generate_report_deterministic_and_random():
    bank = build_prompt_bank()
    findings = [["Mass"], ["Suspicious Calcification"], ["Asymmetry"], []]
    r1 = generate_report_from_labels(findings, bank, deterministic=True)
    r2 = generate_report_from_labels(findings, bank, deterministic=True)
    assert r1 == r2
    import random

    r3 = generate_report_from_labels(findings, bank, rng=random.Random(0))
    r4 = generate_report_from_labels(findings, bank, rng=random.Random(1))
    assert r3 != r4 or len(r3) > 0


# ---------------------------------------------------------------- tokenizer


def test_wordpiece_greedy_longest_match():
    vocab = {t: i for i, t in enumerate(
        ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "the", "mass", "ma", "##ss", "##s", "break", "##fast"]
    )}
    tok = WordPieceTokenizer(vocab, lowercase=True)
    assert tok.tokenize_ids("the mass") == [vocab["the"], vocab["mass"]]
    assert tok.tokenize_ids("breakfast") == [vocab["break"], vocab["##fast"]]
    assert tok.tokenize_ids("zzz") == [vocab["[UNK]"]]
    enc = tok(["the mass", "break"], max_length=6)
    assert enc["input_ids"].shape == (2, 6)
    np.testing.assert_array_equal(
        enc["input_ids"][0], [vocab["[CLS]"], vocab["the"], vocab["mass"], vocab["[SEP]"], 0, 0]
    )
    np.testing.assert_array_equal(enc["attention_mask"][0], [1, 1, 1, 1, 0, 0])


def test_hash_tokenizer_fixed_shapes_and_determinism():
    tok = HashTokenizer(vocab_size=1000)
    e1 = tok(["there is a mass"], max_length=8)
    e2 = tok(["there is a mass"], max_length=8)
    np.testing.assert_array_equal(e1["input_ids"], e2["input_ids"])
    assert e1["input_ids"].max() < 1000
    assert e1["input_ids"][0, 0] == tok.cls_id


# ---------------------------------------------------------------- metadata


def test_parse_list_cell():
    assert parse_list_cell("['a.png', 'b.png']") == ["a.png", "b.png"]
    assert parse_list_cell("plain.png") == ["plain.png"]
    assert parse_list_cell(["x"]) == ["x"]


def test_split_dataframe_fold_and_split_column():
    df_fold = pd.DataFrame({"patient_id": list("abcd"), "fold": [0, 1, 2, 1]})
    train = split_dataframe(df_fold, "train", cur_fold=1)
    valid = split_dataframe(df_fold, "valid", cur_fold=1)
    assert set(train.patient_id) == {"a", "c"}
    assert set(valid.patient_id) == {"b", "d"}

    df_split = pd.DataFrame({"patient_id": list("ab"), "split": ["training", "test"]})
    assert split_dataframe(df_split, "train").patient_id.tolist() == ["a"]
    assert split_dataframe(df_split, "valid").patient_id.tolist() == ["b"]


# ---------------------------------------------------------------- datasets


def _imagetext_df():
    return pd.DataFrame(
        {
            "patient_id": ["p1", "p2"],
            "laterality": ["R", "L"],
            "image": [["i1.png", "i2.png"], ["i3.png"]],
            "view": [["CC", "MLO"], ["CC"]],
            "CC": [["i1.png"], ["i3.png"]],
            "MLO": [["i2.png"], []],
            "text": [["finding text one.", "impression text one."], ["only text."]],
            "text_augment": [["aug one.", "aug impression."], ["aug only."]],
            "fold": [1, 2],
        }
    )


def test_imagetext_dataset_two_views_and_texts():
    ds = ImageTextDataset(_imagetext_df(), SyntheticImageStore((32, 24)), split="train")
    item = ds[0]
    assert item["image"].shape == (32, 24)
    assert item["image_view"].shape == (32, 24)
    assert isinstance(item["text"], str) and isinstance(item["text2"], str)
    # deterministic per (seed, index)
    item2 = ds[0]
    np.testing.assert_array_equal(item["image"], item2["image"])
    assert item["text"] == item2["text"]
    ds.reseed(1)
    _ = ds[0]  # different epoch reseeds without error


def test_imagetext_dataset_vindr_labels():
    df = pd.DataFrame(
        {
            "patient_id": ["v1"],
            "image": [["a.png", "b.png"]],
            "view": [["CC", "MLO"]],
            "CC": [["a.png"]],
            "MLO": [["b.png"]],
            "CC_FINDING": [[["Mass"], [], [], ["Suspicious Calcification"]]],
            "MLO_FINDING": [[["No Finding"], [], ["Mass"], []]],
        }
    )
    ds = ImageTextDataset(df, SyntheticImageStore((16, 16)), split="valid")
    item = ds[0]
    texts = item["text"] + " " + item["text2"]
    assert "mass" in texts or "no mammographic evidence" in texts


def test_classification_dataset_and_factory():
    df = pd.DataFrame({"patient_id": ["p"], "image_id": ["x.png"], "cancer": [1]})
    ds = load_dataset("image_classification", df=df, image_store=SyntheticImageStore((8, 8)), label_col="cancer")
    item = ds[0]
    assert item["label"] == 1.0 and item["image"].shape == (8, 8)
    with pytest.raises(KeyError):
        load_dataset("nope")


# ---------------------------------------------------------------- pipeline


def test_batcher_shapes_and_epoch_shuffle():
    ds = ImageTextDataset(
        pd.concat([_imagetext_df()] * 4, ignore_index=True),
        SyntheticImageStore((16, 12)),
        split="train",
    )
    tok = HashTokenizer(vocab_size=512)
    b = Batcher(ds, tok, batch_size=4, max_length=12, seed=3, process_index=0, process_count=1)
    batches = list(b)
    assert len(batches) == len(b) == 2
    x = batches[0]
    assert x["images"].shape == (4, 16, 12, 1)
    assert x["image_views"].shape == (4, 16, 12, 1)
    assert x["input_ids"].shape == (4, 12)
    assert x["input_ids2"].shape == (4, 12)
    b.set_epoch(1)
    batches_e1 = list(b)
    assert not np.array_equal(batches[0]["images"], batches_e1[0]["images"])


def test_prefetch_to_device():
    ds = ImageTextDataset(_imagetext_df(), SyntheticImageStore((8, 8)), split="train")
    tok = HashTokenizer(vocab_size=64)
    b = Batcher(ds, tok, batch_size=2, max_length=8, process_index=0, process_count=1)
    out = list(prefetch_to_device(iter(b), depth=2))
    assert len(out) == 1
    import jax

    assert isinstance(out[0]["images"], jax.Array)


def test_prefetch_propagates_errors():
    def bad_iter():
        yield {"images": np.zeros((1, 2, 2, 1))}
        raise RuntimeError("boom")

    with pytest.raises(RuntimeError, match="boom"):
        list(prefetch_to_device(bad_iter(), depth=1))


def test_batcher_weighted_sampling_balances_classes():
    """Weighted sampling oversamples the rare class (reference WeightedRandomSampler,
    dataset_utils.py:147-165)."""

    class _TinyDS:
        def __len__(self):
            return 100

        def __getitem__(self, i):
            return {"image": np.full((4, 4), i % 10, np.uint8), "label": float(i < 10)}

    ds = _TinyDS()
    labels = np.array([1.0 if i < 10 else 0.0 for i in range(100)])
    weights = np.where(labels == 1.0, 9.0, 1.0)  # rare positives upweighted
    tok = HashTokenizer(vocab_size=32)
    b = Batcher(ds, tok, batch_size=20, max_length=4, sample_weights=weights,
                process_index=0, process_count=1, seed=0)
    pos_frac = []
    for epoch in range(5):
        b.set_epoch(epoch)
        for batch in b:
            pos_frac.append(np.mean(batch["labels"]))
    # unweighted would give ~0.10 positives; weighted targets ~0.50
    assert 0.3 < np.mean(pos_frac) < 0.7, np.mean(pos_frac)


def test_wordpiece_matches_hf_bert_tokenizer(tmp_path):
    """Our WordPiece == transformers' BertTokenizer on the same vocab file."""
    vocab = [
        "[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]",
        "there", "is", "a", "mass", "in", "the", "right", "breast",
        "calc", "##ification", "##s", "micro", "##calc", "benign", ",", ".",
    ]
    vocab_file = tmp_path / "vocab.txt"
    vocab_file.write_text("\n".join(vocab) + "\n")

    from transformers import BertTokenizer

    hf = BertTokenizer(str(vocab_file), do_lower_case=True)
    from mammo_clip_tpu.data.tokenizer import WordPieceTokenizer

    ours = WordPieceTokenizer.from_vocab_file(str(vocab_file), lowercase=True)

    texts = [
        "there is a mass in the right breast.",
        "benign microcalcifications, there IS calcification",
        "unknownword mass",
    ]
    for t in texts:
        ref = hf(t, padding="max_length", truncation=True, max_length=16)
        got = ours([t], max_length=16)
        np.testing.assert_array_equal(got["input_ids"][0], ref["input_ids"], err_msg=t)
        np.testing.assert_array_equal(got["attention_mask"][0], ref["attention_mask"], err_msg=t)
