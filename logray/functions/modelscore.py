"""Model-based batch scoring: the load-once / score-batches actor shape.

This is the stage pattern every model-scored training-data pipeline needs
(quality classifiers, embedding models, reward models): the MODEL loads
ONCE per actor in ``__init__`` — never per batch — and ``__call__`` scores
whole Arrow batches vectorized.  ``model_score_stage`` wires it as a Ray
actor pool with optional ``num_gpus`` so the same code drives a GPU fleet
(``num_gpus=1, concurrency=#GPUs``) or a CPU pool.

No ML framework ships in this container, so the default ``loader`` builds
a deterministic LINEAR PROBE over hashed byte n-gram features (pure
numpy): a real model with the same interface — ``(matrix) -> scores`` —
drops in via the ``loader`` argument (e.g. load torch weights from a
checkpoint path inside the loader; the path travels as a constructor
kwarg, the weights never leave the actor).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from logray.vparse import _string_buffer_views

#: feature space: hashed byte-trigram counts
DEFAULT_DIM = 256


def hashed_ngram_features(texts, dim: int = DEFAULT_DIM, n: int = 3) -> np.ndarray:
    """(rows, dim) float32 hashed byte-n-gram count features, L2-normalized.
    One vectorized pass over the batch's UTF-8 buffer — no per-row loop."""
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    data, starts, ends = _string_buffer_views(texts)
    n_rows = len(starts)
    out = np.zeros((n_rows, dim), np.float32)
    total = len(data)
    if total >= n and n_rows:
        h = np.zeros(total - n + 1, np.uint64)
        B = np.uint64(1000003)
        for j in range(n):
            h = h * B + data[j : total - n + 1 + j].astype(np.uint64)
        buckets = (h % np.uint64(dim)).astype(np.int64)
        pos = np.arange(total - n + 1)
        # row owning each n-gram start (duplicate starts from empty rows
        # resolve to the following non-empty row via side="right")
        row_of = np.searchsorted(starts, pos, side="right") - 1
        ok = row_of >= 0
        ok[ok] &= pos[ok] + n <= ends[row_of[ok]]
        flat = row_of[ok] * dim + buckets[ok]
        np.add.at(out.reshape(-1), flat, 1.0)
    norms = np.linalg.norm(out, axis=1)
    norms[norms == 0] = 1.0
    return out / norms[:, None]


def default_linear_probe(dim: int = DEFAULT_DIM, seed: int = 123):
    """Deterministic stand-in 'model': a seeded linear probe + sigmoid.
    Same call contract a real quality model would have."""
    rng = np.random.default_rng(seed)
    w = rng.standard_normal(dim).astype(np.float32)
    b = np.float32(0.1)

    def score(feats: np.ndarray) -> np.ndarray:
        z = feats @ w + b
        return (1.0 / (1.0 + np.exp(-z))).astype(np.float32)

    return score


class ModelScoreBatch:
    """Actor-pool scoring stage: model built ONCE in ``__init__``.

    ``loader() -> (matrix -> scores)`` runs in the actor (GPU-local when
    scheduled with ``num_gpus``); ``__call__`` featurizes + scores one
    Arrow batch and appends ``score_col``."""

    def __init__(self, text_col: str = "text", score_col: str = "model_score",
                 loader=None, dim: int = DEFAULT_DIM, n: int = 3):
        self.text_col = text_col
        self.score_col = score_col
        self.dim = dim
        self.n = n
        # the expensive part — once per actor, not per batch
        self.model = (loader or default_linear_probe)()

    def __call__(self, t: pa.Table) -> pa.Table:
        feats = hashed_ngram_features(t[self.text_col], self.dim, self.n)
        scores = self.model(feats)
        if self.score_col in t.column_names:
            t = t.drop_columns([self.score_col])
        return t.append_column(self.score_col, pa.array(scores, pa.float32()))


def model_score_stage(ds, text_col: str = "text", score_col: str = "model_score",
                      loader=None, concurrency=(1, 8), batch_size: int | None = None,
                      num_gpus: float | None = None, **kw):
    """Score a Dataset with an actor pool.  For GPU models pass
    ``num_gpus=1`` (or a fraction) and set ``concurrency`` to the GPU
    count — Ray schedules one actor per GPU and batches stream through."""
    ray_kwargs = dict(
        fn_constructor_kwargs=dict(text_col=text_col, score_col=score_col,
                                   loader=loader, **kw),
        batch_format="pyarrow",
        batch_size=batch_size,
        zero_copy_batch=True,
        concurrency=concurrency,
    )
    if num_gpus is not None:
        ray_kwargs["num_gpus"] = num_gpus
    return ds.map_batches(ModelScoreBatch, **ray_kwargs)
