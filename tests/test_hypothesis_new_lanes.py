"""Hypothesis properties for the round-5 lanes — pure-Python kernel
invariants (no Spark session, so examples are cheap): AVI container
round-trips over arbitrary payloads, tokenizer reconstruction, Morton
bijectivity, LM scorer bounds."""

from __future__ import annotations

import math

from hypothesis import given, settings
from hypothesis import strategies as st

from spotify_etl_aws_spark.operators.bpe import _encode_word, _merge_word
from spotify_etl_aws_spark.operators.lm import CharLmModel, _doc_log_ppl
from spotify_etl_aws_spark.operators.unigram import _viterbi, _word_ll
from spotify_etl_aws_spark.operators.video import (
    avi_n_bytes,
    encode_avi_mjpeg,
    extract_frame,
    parse_avi,
)

_SETTINGS = dict(max_examples=50, deadline=None)


# AVI stores MJPEG chunks verbatim and parse_avi never entropy-decodes,
# so the container contract must hold for ARBITRARY frame payloads —
# including empty-ish, odd-length, and marker-colliding bytes.
@settings(**_SETTINGS)
@given(
    frames=st.lists(st.binary(min_size=1, max_size=200), min_size=1, max_size=8),
    fps=st.integers(min_value=1, max_value=120),
)
def test_avi_container_roundtrip_any_payload(frames, fps):
    avi = encode_avi_mjpeg(frames, fps=fps, width=32, height=24)
    assert len(avi) == avi_n_bytes([len(f) for f in frames])
    m = parse_avi(avi)
    assert (m.width, m.height, m.n_frames) == (32, 24, len(frames))
    assert m.fps == float(fps)
    for i, f in enumerate(frames):
        assert extract_frame(avi, m, i) == f
    # index fast path == movi scan fallback
    assert m.frame_index == parse_avi(avi, use_index=False).frame_index


_words = st.text(
    alphabet=st.sampled_from("abcdef"), min_size=0, max_size=24
)
_pairs = st.lists(
    st.tuples(
        st.text(alphabet=st.sampled_from("abcdef"), min_size=1, max_size=3),
        st.text(alphabet=st.sampled_from("abcdef"), min_size=1, max_size=3),
    ),
    max_size=12,
)


@settings(**_SETTINGS)
@given(word=_words, merges=_pairs)
def test_bpe_encode_reconstructs_for_any_ranks(word, merges):
    """Whatever (even nonsensical) merge table is learned, the encoder
    must never lose or invent characters."""
    ranks = {p: i for i, p in enumerate(merges)}
    toks = _encode_word(word, ranks)
    assert "".join(toks) == word
    assert all(toks)  # no empty tokens


@settings(**_SETTINGS)
@given(word=_words.filter(bool), merges=_pairs)
def test_merge_word_preserves_string(word, merges):
    syms = tuple(word)
    for p in merges:
        syms = _merge_word(syms, p)
        assert "".join(syms) == word


@settings(**_SETTINGS)
@given(
    word=_words,
    vocab=st.dictionaries(
        st.text(alphabet=st.sampled_from("abcdef"), min_size=1, max_size=4),
        st.floats(min_value=-20.0, max_value=-0.1),
        max_size=20,
    ),
)
def test_viterbi_reconstructs_and_scores_consistently(word, vocab):
    seg = _viterbi(word, vocab, 4)
    assert "".join(seg) == word
    # the DP score equals the returned path's score (char fallback for
    # out-of-vocab singles); both are 0.0 for the empty word
    score = sum(vocab.get(p, -30.0) for p in seg)
    assert math.isclose(_word_ll(word, vocab, 4), score)


@settings(**_SETTINGS)
@given(x=st.integers(0, 4095), y=st.integers(0, 4095))
def test_morton_interleave_is_bijective(x, y):
    bits = 12
    z = 0
    for k, v in enumerate((x, y)):
        for b in range(bits):
            z |= ((v >> b) & 1) << (b * 2 + k)
    # de-interleave recovers both coordinates
    rx = sum(((z >> (b * 2)) & 1) << b for b in range(bits))
    ry = sum(((z >> (b * 2 + 1)) & 1) << b for b in range(bits))
    assert (rx, ry) == (x, y)


@settings(**_SETTINGS)
@given(
    text=st.text(alphabet=st.sampled_from("ab "), min_size=0, max_size=40),
    alpha=st.floats(min_value=0.01, max_value=2.0),
)
def test_lm_score_bounds(text, alpha):
    """Perplexity under any count model is a positive, finite number of
    bits (smoothing forbids zero-probability events), or None when the
    text is shorter than the order."""
    m = CharLmModel(
        order=2,
        ngram_counts={"ab": 3, "ba": 2, "a ": 1},
        context_counts={"a": 4, "b": 2, " ": 1},
        n_chars=3,
        alpha=alpha,
    )
    s = _doc_log_ppl(text, m)
    if len(text) < 2:
        assert s is None
    else:
        assert s is not None and math.isfinite(s) and s > 0.0


@settings(**_SETTINGS)
@given(payload=st.binary(min_size=0, max_size=3000))
def test_gif_lzw_roundtrip_any_bytes(payload):
    from spotify_etl_aws_spark.operators.gif import _lzw_decode, _lzw_encode

    assert _lzw_decode(_lzw_encode(payload), 8) == payload
