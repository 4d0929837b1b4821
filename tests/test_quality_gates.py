"""Measured-quality gates for the two cheapest rows-only ops (round-4
verdict #7): language ID and rolling-hash fingerprints. Every other
approximate path already carries a per-run quality number (ANN recall,
LSH pair recall, HLL tolerance, space-saving bounds); these two now do
too. Pure batch-function tests — no Ray session needed.

Note: the driver testdata's ``documents.lang`` column is NOT usable as
langid ground truth — the synthetic text is English-register lorem for
every label (measured 0.32 "accuracy" against it, with es/de/fr rows
all predicting en), so the gate uses the repo's labeled held-out
sentences instead.
"""

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.01"


def test_langid_labeled_accuracy():
    """n-gram heuristic accuracy on labeled held-out sentences (six
    languages, natural register, some with zero/ambiguous profile
    words). Measured 0.917 at gate-writing time; gate at 0.85 so
    profile tweaks that genuinely regress the detector fail loudly
    while leaving head-room for honest misses."""
    from crawler_ray.functions.langid import labeled_accuracy
    acc = labeled_accuracy()
    assert acc >= 0.85, acc


def test_langid_unknown_on_profile_free_text():
    """No profile word at all → ('und', confidence 0), never a
    confident wrong guess."""
    from crawler_ray.functions.langid import detect_language_batch
    langs, conf = detect_language_batch(
        ["zzz qqq xxx", "", None, "12345 67890"])
    assert langs == ["und"] * 4
    assert (conf == 0).all()


def test_fingerprint_identity_and_collisions():
    """Fingerprint quality = identity fidelity: equal texts must
    collide, distinct texts must not (64-bit rolling hash → expected
    collisions over a few hundred distinct docs ~ 0). Checked against
    the real sf0.01 documents table."""
    from crawler_ray.functions.textops import fingerprints
    t = pq.read_table(SF + "/documents.parquet",
                      columns=["doc_id", "text"])
    out = fingerprints(t)
    n_texts = pc.count_distinct(t["text"]).as_py()
    n_fps = pc.count_distinct(out["fingerprint"]).as_py()
    # distinct fingerprints == distinct texts: no collisions AND
    # duplicate texts map to the same fingerprint
    assert n_fps == n_texts, (n_fps, n_texts)
    # determinism: same batch → identical fingerprints
    again = fingerprints(t)
    assert out["fingerprint"].to_pylist() == again["fingerprint"].to_pylist()


def test_fingerprint_shift_sensitivity():
    """A rolling hash must distinguish permuted content (same bag of
    bytes, different order) — the failure mode a simple byte-sum
    'fingerprint' would have."""
    from crawler_ray.functions.textops import fingerprints
    t = pa.table({"doc_id": pa.array([1, 2], pa.int64()),
                  "text": pa.array(["abcdef", "fedcba"])})
    fp = fingerprints(t)["fingerprint"].to_pylist()
    assert fp[0] != fp[1]
