"""Real-vocab WordPiece encoding (P10 parity for BERT-family converted
checkpoints): greedy longest-match-first pieces with HF
WordpieceTokenizer semantics, the [CLS]/[SEP] pair frame, and the
vocab-validated NumpyDittoBackend mode end-to-end with a converted
reference-layout checkpoint."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from ditto_spark.operators.npmodel import (
    NumpyDittoBackend,
    _basic_tokens,
    load_wordpiece_ids,
    make_weights,
    wordpiece_encode_pair,
    wordpiece_word_ids,
)

# the classic HF wordpiece doctest vocabulary, specials first
VOCAB = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "un", "##aff", "##able",
         "want", "##ed", "runn", "##ing", "'", "s", "hi", ",", "99"]
V = {p: i for i, p in enumerate(VOCAB)}


def _ids(word):
    return wordpiece_word_ids(word, V, V["[UNK]"])


def test_wordpiece_greedy_longest_match():
    # the canonical HF example: unaffable -> un ##aff ##able
    assert _ids("unaffable") == [V["un"], V["##aff"], V["##able"]]
    assert _ids("wanted") == [V["want"], V["##ed"]]
    assert _ids("running") == [V["runn"], V["##ing"]]
    # any unmatchable remainder -> the WHOLE word is one [UNK]
    # (matched prefix pieces are discarded, the is_bad path)
    assert _ids("unaffordable") == [V["[UNK]"]]
    assert _ids("zzz") == [V["[UNK]"]]
    # over-long word -> [UNK]
    assert wordpiece_word_ids("a" * 101, V, V["[UNK]"]) == [V["[UNK]"]]


def test_basic_tokens_split_punctuation():
    # HF BasicTokenizer: punctuation chars are their own tokens,
    # underscore included; lowercasing applied
    assert _basic_tokens("Hi, it's 99!") == [
        "hi", ",", "it", "'", "s", "99", "!"]
    assert _basic_tokens("a_b") == ["a", "_", "b"]
    assert _basic_tokens("") == []


def test_encode_pair_frame_and_truncation():
    ids = wordpiece_encode_pair("hi", "wanted", V, max_len=64)
    assert ids == [V["[CLS]"], V["hi"], V["[SEP]"],
                   V["want"], V["##ed"], V["[SEP]"]]
    assert wordpiece_encode_pair("hi", "wanted", V, max_len=4) == [
        V["[CLS]"], V["hi"], V["[SEP]"], V["want"]]


def test_backend_real_vocab_mode(tmp_path):
    vocab_path = str(tmp_path / "vocab.txt")
    with open(vocab_path, "w") as f:
        f.write("\n".join(VOCAB) + "\n")
    # weights sized to the vocab (vocab_size must match exactly)
    w = make_weights(0, {"vocab_size": len(VOCAB), "d_model": 16,
                         "n_heads": 2, "d_ff": 32, "n_layers": 1,
                         "max_len": 32})
    be = NumpyDittoBackend(weights=w, vocab_path=vocab_path)
    left = pd.Series(["unaffable wanted", "hi"])
    right = pd.Series(["unaffable wanted", "running 99"])
    p = be.score_batch(left, right)
    assert len(p) == 2 and np.isfinite(p).all()
    assert ((p > 0) & (p < 1)).all()
    # identical inputs score identically regardless of batch company
    p_solo = be.score_batch(left[:1], right[:1])
    assert np.isclose(p[0], p_solo[0])
    # vocab participates in the backend identity
    be_hash = NumpyDittoBackend(weights=w)
    assert be.fingerprint != be_hash.fingerprint
    # mismatched vocab/weights refuse loudly
    wrong = make_weights(0, {"vocab_size": 1024, "d_model": 16,
                             "n_heads": 2, "d_ff": 32, "n_layers": 1,
                             "max_len": 32})
    with pytest.raises(ValueError, match="wrong\\s+vocab|pieces"):
        NumpyDittoBackend(weights=wrong, vocab_path=vocab_path)
    # a vocab without the specials refuses
    bad = str(tmp_path / "bad.txt")
    with open(bad, "w") as f:
        f.write("just\nwords\n")
    with pytest.raises(ValueError, match="\\[PAD\\]"):
        NumpyDittoBackend(weights=w, vocab_path=bad)
    # nonzero [PAD] id refuses (the mask assumes PAD=0)
    shifted = str(tmp_path / "shifted.txt")
    with open(shifted, "w") as f:
        f.write("\n".join(["[UNK]", "[PAD]", "[CLS]", "[SEP]"] +
                          VOCAB[4:]) + "\n")
    with pytest.raises(ValueError, match="PAD=0"):
        NumpyDittoBackend(weights=w, vocab_path=shifted)


def test_converted_checkpoint_with_real_vocab(tmp_path):
    """The full story: reference-layout state -> convert_state -> npz ->
    backend with the checkpoint's own vocab — executable today, only
    the offline torch->npz dump is missing for a real model."""
    from tests.test_convert_checkpoint import _hf_state, H, V as VS, D, FF, L, P
    from tools.convert_checkpoint import convert_state

    weights, _ = convert_state({"model": _hf_state()}, n_heads=H)
    # a vocab sized to the synthetic checkpoint's embedding table
    pieces = ["[PAD]", "[UNK]", "[CLS]", "[SEP]"] + [
        f"w{i}" for i in range(VS - 4)]
    vocab_path = str(tmp_path / "vocab.txt")
    with open(vocab_path, "w") as f:
        f.write("\n".join(pieces) + "\n")
    be = NumpyDittoBackend(weights=weights, vocab_path=vocab_path)
    p = be.score_batch(pd.Series(["w1 w2 unknownword"]),
                       pd.Series(["w1 w2 w3"]))
    assert np.isfinite(p[0]) and 0 < p[0] < 1


# ---------------------------------------------------------------------------
# sentence encoder (M7) + the model_embed blocking seam
# ---------------------------------------------------------------------------

def _tiny_encoder():
    from ditto_spark.operators.npmodel import (NumpySentenceEncoder,
                                               make_weights)

    w = make_weights(1, {"vocab_size": 256, "d_model": 16, "n_heads": 2,
                         "d_ff": 32, "n_layers": 1, "max_len": 32})
    return NumpySentenceEncoder(weights=w)


def test_sentence_encoder_unit_norm_and_batch_invariance():
    enc = _tiny_encoder()
    texts = ["alpha beta gamma", "a much longer sentence with many words "
             "to force a different padded length", "alpha beta gamma"]
    vecs = enc.encode_batch(texts)
    assert vecs.shape == (3, 16)
    norms = np.linalg.norm(vecs, axis=1)
    assert np.allclose(norms, 1.0)
    # identical texts -> identical vectors, regardless of batch company
    assert np.allclose(vecs[0], vecs[2])
    solo = enc.encode_batch(["alpha beta gamma"])[0]
    assert np.allclose(vecs[0], solo)  # padding must not leak into mean
    # deterministic across instances
    assert np.allclose(_tiny_encoder().encode_batch(texts), vecs)


def test_encoder_only_conversion_feeds_sentence_encoder(tmp_path):
    """A headless HF encoder state (no fc.*, bare keys) converts with
    --encoder-only and encodes through NumpySentenceEncoder."""
    from ditto_spark.operators.npmodel import (NumpySentenceEncoder,
                                               load_checkpoint,
                                               save_checkpoint)
    from tests.test_convert_checkpoint import _hf_state
    from tools.convert_checkpoint import convert_state

    bare = {k[len("bert."):]: v for k, v in _hf_state().items()
            if k.startswith("bert.")}
    weights, _ = convert_state(bare, n_heads=2, encoder_only=True)
    assert weights["fc.weight"].sum() == 0  # minted zero head
    path = str(tmp_path / "enc.npz")
    save_checkpoint(weights, path)
    enc = NumpySentenceEncoder(weights=load_checkpoint(path))
    v = enc.encode_batch(["hello world", "hello world", "other"])
    assert np.allclose(v[0], v[1]) and not np.allclose(v[0], v[2])
    # without encoder_only a headless state still refuses
    with pytest.raises(ValueError, match="bert"):
        convert_state(bare, n_heads=2)


def test_model_embed_and_blocking_seam(spark):
    """model_embed runs the encoder distributed and matches the local
    encode exactly; two_table_topk_blocking(encoder_factory=...) ranks
    an identical text as its own nearest neighbor at sim ~1."""
    from ditto_spark.operators.embed import (model_embed,
                                             two_table_topk_blocking)
    from ditto_spark.operators.npmodel import (NumpySentenceEncoder,
                                               make_weights)

    cfgd = {"vocab_size": 256, "d_model": 16, "n_heads": 2,
            "d_ff": 32, "n_layers": 1, "max_len": 32}

    def factory():
        return NumpySentenceEncoder(weights=make_weights(1, cfgd))

    factory.fingerprint = "np-sent-enc-test"
    rows = [(f"d{i}", f"entity number {i} alpha beta") for i in range(12)]
    df = spark.createDataFrame(rows, "id string, text string")
    got = {r["id"]: np.array(r["vec"])
           for r in model_embed(df, "id", "text", factory).collect()}
    local = NumpySentenceEncoder(weights=make_weights(1, cfgd))
    want = local.encode_batch([t for _, t in rows])
    for i, (rid, _) in enumerate(rows):
        assert np.allclose(got[rid], want[i], atol=1e-12), rid

    pairs = two_table_topk_blocking(
        df, df, k=1, id_col="id", text_col="text",
        encoder_factory=factory, exact=True)
    top = {r["right_id"]: (r["left_id"], r["sim"]) for r in pairs.collect()}
    for rid in got:
        assert top[rid][0] == rid and top[rid][1] >= 0.999999


# ---------------------------------------------------------------------------
# hypothesis properties of the WordPiece segmenter
# ---------------------------------------------------------------------------

try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    _HYP = True
except ImportError:  # pragma: no cover
    _HYP = False

if _HYP:
    _word = st.text(alphabet="abcdefghijklmnopqrstuvwxyz0123456789",
                    min_size=1, max_size=24)

    @given(_word)
    @settings(max_examples=300, deadline=None)
    def test_wordpiece_reconstructs_or_unks(w):
        """For ANY word: either the pieces reconstruct the word exactly
        (strip '##', concatenate) or the output is exactly [UNK] — the
        two HF-legal outcomes; ids are always valid vocab ids."""
        rev = {i: p for p, i in V.items()}
        ids = wordpiece_word_ids(w, V, V["[UNK]"])
        assert ids and all(i in rev for i in ids)
        if ids == [V["[UNK]"]]:
            return
        pieces = [rev[i] for i in ids]
        assert pieces[0] in V and not pieces[0].startswith("##")
        assert all(p.startswith("##") for p in pieces[1:])
        assert pieces[0] + "".join(p[2:] for p in pieces[1:]) == w

    @given(st.lists(_word, min_size=0, max_size=6).map(" ".join),
           st.lists(_word, min_size=0, max_size=6).map(" ".join))
    @settings(max_examples=100, deadline=None)
    def test_encode_pair_frame_properties(a, b):
        """Frame invariants for any pair: starts with [CLS], at most
        two [SEP]s, never exceeds max_len, never contains [PAD]."""
        ids = wordpiece_encode_pair(a, b, V, max_len=32)
        assert ids[0] == V["[CLS]"]
        assert len(ids) <= 32
        assert ids.count(V["[SEP]"]) <= 2
        assert V["[PAD]"] not in ids
