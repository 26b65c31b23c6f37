#!/usr/bin/env python
"""Record a vocabulary-scale (>=1k merge) exact=False BPE train — the
30k-vocab production path's wall-clock/pass-count evidence. The
synthetic documents table exhausts at ~113 merges (31-word template
vocabulary), so the corpus is operators.bpe.synthetic_word_corpus at
sf1-equivalent document scale (500k docs x 40 words, 30k-word
vocabulary). Prints one JSON line: merges, passes, wall seconds,
merges/pass.

Usage: python tools/bpe_train_record.py [n_docs] [vocab] [num_merges]
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 500_000
    vocab = int(sys.argv[2]) if len(sys.argv) > 2 else 30_000
    num_merges = int(sys.argv[3]) if len(sys.argv) > 3 else 1_000

    from vector_io_spark.operators import bpe
    from vector_io_spark.operators.bpe import bpe_train, synthetic_word_corpus
    from vector_io_spark.session import get_spark

    spark = get_spark(app_name="bpe_train_record")
    docs = synthetic_word_corpus(
        spark, n_docs=n_docs, vocab=vocab, words_per_doc=40
    )
    t0 = time.perf_counter()
    merges, vocab_df, words_df = bpe_train(
        docs, "text", num_merges=num_merges, merge_batch=64, exact=False
    )
    n_tokens = vocab_df.count()
    wall = round(time.perf_counter() - t0, 1)
    print(json.dumps({
        "n_docs": n_docs,
        "vocab_words": vocab,
        "merges": len(merges),
        "passes": bpe.LAST_TRAIN_PASSES,
        "merges_per_pass": round(len(merges) / bpe.LAST_TRAIN_PASSES, 2),
        "wall_sec": wall,
        "final_vocab_tokens": n_tokens,
    }))


if __name__ == "__main__":
    main()
