"""Text analysis stages: language-ID, quality scoring, token counting,
document fingerprinting — actor-pool ``map_batches`` over the documents
table (prompt scope: training-data pipeline operators)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa


class QualityStage:
    """Callable class -> actor pool: stopword sets / regexes compiled
    once per actor (SURVEY §2.3 pattern)."""

    def __init__(self):
        # importing binds the module-level compiled regexes once
        from ..functions import textstats

        self.ts = textstats

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        n = len(texts)
        n_words = np.zeros(n, dtype=np.int64)
        n_chars = np.zeros(n, dtype=np.int64)
        n_stop = np.zeros(n, dtype=np.int64)
        n_punct = np.zeros(n, dtype=np.int64)
        stop_ratio = np.zeros(n, dtype=np.float64)
        punct_ratio = np.zeros(n, dtype=np.float64)
        mean_wl = np.zeros(n, dtype=np.float64)
        score = np.zeros(n, dtype=np.float64)
        lang_pred: list[str] = []
        tok_ws = np.zeros(n, dtype=np.int64)
        tok_bpe = np.zeros(n, dtype=np.int64)
        fps = np.zeros(n, dtype=np.int64)
        for i, t in enumerate(texts):
            s = self.ts.quality_stats(t)
            n_words[i] = s["n_words"]
            n_chars[i] = s["n_chars"]
            n_stop[i] = s["n_stop"]
            n_punct[i] = s["n_punct"]
            stop_ratio[i] = round(s["stopword_ratio"], 6)
            punct_ratio[i] = round(s["punct_ratio"], 6)
            mean_wl[i] = round(s["mean_word_len"], 6)
            score[i] = self.ts.quality_score(t)
            lang_pred.append(self.ts.detect_language(t))
            tok_ws[i] = self.ts.token_count_ws(t)
            tok_bpe[i] = self.ts.token_count_bpeish(t)
            fps[i] = self.ts.doc_fingerprint(t or "") & 0x7FFFFFFFFFFFFFFF
        out = pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "lang": batch.column("lang"),
                "lang_pred": pa.array(lang_pred, pa.string()),
                "n_words": pa.array(n_words),
                "n_chars": pa.array(n_chars),
                "n_stop": pa.array(n_stop),
                "n_punct": pa.array(n_punct),
                "stopword_ratio": pa.array(stop_ratio),
                "punct_ratio": pa.array(punct_ratio),
                "mean_word_len": pa.array(mean_wl),
                "quality_score": pa.array(score),
                "tokens_ws": pa.array(tok_ws),
                "tokens_bpeish": pa.array(tok_bpe),
                "doc_fp": pa.array(fps),
            }
        )
        return out


def quality_stage(ds, concurrency=(1, 4), batch_size: int = 512):
    return ds.map_batches(
        QualityStage,
        batch_format="pyarrow",
        concurrency=concurrency,
        batch_size=batch_size,
    )
