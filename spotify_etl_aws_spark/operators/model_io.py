"""Persistence for driver-side model state (tokenizers, the char LM):
plain-JSON save/load so a model trained in one Spark session is
reusable in the next — the artifact contract a training pipeline
needs (train the tokenizer ONCE on the corpus snapshot, encode with
it forever after).

JSON keeps the artifacts human-inspectable and engine-portable; the
files are O(vocab) and live next to the corpus, not in the lake. A
``kind`` tag dispatches load; BPE ranks are not stored (derivable
from merge order), keeping the merge list the single source of
truth.
"""

from __future__ import annotations

import json
import os

from spotify_etl_aws_spark.operators.bpe import BpeModel
from spotify_etl_aws_spark.operators.classifier import LinearQualityModel
from spotify_etl_aws_spark.operators.dsir import DsirModel
from spotify_etl_aws_spark.operators.lm import CharLmModel
from spotify_etl_aws_spark.operators.unigram import UnigramModel

Model = BpeModel | UnigramModel | CharLmModel | LinearQualityModel | DsirModel


def save_model(model: Model, path: str) -> None:
    """Serialize any trained model to ``path`` (JSON, atomic rename so
    a concurrent reader never sees a torn file)."""
    if isinstance(model, BpeModel):
        doc = {
            "kind": "bpe",
            "merges": [[a, b] for a, b in model.merges],
            "vocab": model.vocab,
        }
    elif isinstance(model, UnigramModel):
        doc = {
            "kind": "unigram",
            "log_probs": model.log_probs,
            "max_piece_len": model.max_piece_len,
        }
    elif isinstance(model, CharLmModel):
        doc = {
            "kind": "char_lm",
            "order": model.order,
            "ngram_counts": model.ngram_counts,
            "context_counts": model.context_counts,
            "n_chars": model.n_chars,
            "alpha": model.alpha,
        }
    elif isinstance(model, LinearQualityModel):
        doc = {
            "kind": "linear_quality",
            "dim": model.dim,
            "shingle_n": model.shingle_n,
            "bias": model.bias,
            "weights": list(model.weights),
        }
    elif isinstance(model, DsirModel):
        doc = {
            "kind": "dsir",
            "n_buckets": model.n_buckets,
            "ngram_max": model.ngram_max,
            "alpha": model.alpha,
            "log_ratio": list(model.log_ratio),
        }
    else:
        raise TypeError(f"unsupported model type {type(model).__name__}")
    tmp = f"{path}.tmp.{os.getpid()}"
    with open(tmp, "w", encoding="utf-8") as f:
        json.dump(doc, f, ensure_ascii=False)
    os.replace(tmp, path)


def load_model(path: str) -> Model:
    """Load whichever model kind ``path`` holds."""
    with open(path, encoding="utf-8") as f:
        doc = json.load(f)
    kind = doc.get("kind")
    if kind == "bpe":
        merges = [tuple(p) for p in doc["merges"]]
        return BpeModel(
            merges, {p: i for i, p in enumerate(merges)}, doc["vocab"]
        )
    if kind == "unigram":
        return UnigramModel(doc["log_probs"], doc["max_piece_len"])
    if kind == "char_lm":
        return CharLmModel(
            doc["order"],
            doc["ngram_counts"],
            doc["context_counts"],
            doc["n_chars"],
            doc["alpha"],
        )
    if kind == "linear_quality":
        return LinearQualityModel(
            doc["dim"], doc["shingle_n"], doc["bias"], tuple(doc["weights"])
        )
    if kind == "dsir":
        return DsirModel(
            doc["n_buckets"],
            doc["ngram_max"],
            doc["alpha"],
            tuple(doc["log_ratio"]),
        )
    raise ValueError(f"unknown model kind {kind!r} in {path}")
