#!/usr/bin/env python
"""Build a HOSTILE variant of a testdata directory and (optionally)
sweep every registered query against it.

The driver's corpus is benign: moderate ASCII text, well-spread
embeddings.  Several past defects (the >256-color palette crash, the
BPE quote-interpolation crash — both ADVICE findings) were invisible
on it because they trigger only on adversarial CONTENT.  This script
appends rows that preserve every DECLARED corpus invariant (schemas;
``props`` stays ``{"k": int}`` so the variant-inference oracle holds;
embeddings stay 64-dim float32; key uniqueness) while maximizing
content hostility:

* documents: empty text, single char, whitespace-only, quotes/
  backslashes/newlines, long all-one-char runs, CJK + emoji +
  combining marks, a >256-distinct-triple diverse text (the palette
  fallback trigger), a 20k-char document, null-ish punctuation soup;
* embeddings: the zero vector (pnorm guards), exact duplicates,
  max-magnitude components, sign-alternating vectors.

Usage:
    python scripts/hostile_corpus.py [src_sf_dir] [dst_dir]
then:
    python scripts/check_oracle.py <dst_dir>
"""

from __future__ import annotations

import os
import shutil
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SRC = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
DST = sys.argv[2] if len(sys.argv) > 2 else "/tmp/dbps_hostile"


def hostile_texts() -> list[str]:
    import random

    rng = random.Random(20260815)
    alphabet = (
        "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ"
        "0123456789 .,;:!?'-()[]{}\"\\"
    )
    diverse = "".join(rng.choice(alphabet) for _ in range(3000))
    return [
        "",
        "x",
        " ",
        "\n\n\n",
        "     \t   \t ",
        "don't won't can't \"quoted\" back\\slash 'single'",
        "aaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaa" * 40,
        "ab" * 600,
        "你好世界 " * 50,          # CJK
        "café naïve résumé " * 30,  # accents
        "ééé " * 40,             # combining marks
        "\U0001f600\U0001f680\U0001f916 " * 30,    # emoji (astral)
        # LONG astral docs: any codec fixture that scales a buffer by
        # CODEPOINT value (the r9 mp4 mdat finding: ord(c) bytes per
        # sample) amplifies these ~128k-1.1Mx — gigabytes if unguarded
        "\U0001f600" * 4000,
        "\U0010ffff" * 2000,
        diverse,                                    # >256 distinct triples
        ("lorem ipsum dolor sit amet " * 800)[:20000],
        "!@#$%^&*()_+-=~`|<>/?" * 25,
        "0" * 500,
        "Mixed CASE And   multiple   spaces\tand\ttabs " * 20,
    ]


def main() -> None:
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    if os.path.exists(DST):
        shutil.rmtree(DST)
    os.makedirs(DST)
    for name in (
        "region nation customer supplier part orders lineitem events"
    ).split():
        shutil.copy(
            os.path.join(SRC, f"{name}.parquet"),
            os.path.join(DST, f"{name}.parquet"),
        )

    # documents: append hostile rows with fresh doc_ids
    docs = pq.read_table(os.path.join(SRC, "documents.parquet"))
    next_id = max(docs.column("doc_id").to_pylist()) + 1
    texts = hostile_texts()
    hostile = pa.table(
        {
            "doc_id": pa.array(
                [next_id + i for i in range(len(texts))], pa.int64()
            ),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(["xx"] * len(texts), pa.string()),
            "source": pa.array(["hostile"] * len(texts), pa.string()),
            "n_chars": pa.array(
                [len(t) for t in texts], pa.int64()
            ),
        }
    )
    pq.write_table(
        pa.concat_tables(
            [docs.select(hostile.column_names), hostile]
        ),
        os.path.join(DST, "documents.parquet"),
    )

    # embeddings: zero vector, duplicates, extremes
    emb = pq.read_table(os.path.join(SRC, "embeddings.parquet"))
    names = emb.column_names
    dim = len(emb.column("embedding")[0].as_py())
    next_vid = max(emb.column("vec_id").to_pylist()) + 1
    first = emb.column("embedding")[0].as_py()
    specials = [
        [0.0] * dim,                         # zero vector (norm guards)
        first,                               # exact duplicate of vec 0
        first,                               # and a second duplicate
        [580.0] * dim,                       # max-magnitude corner
        [(-1.0) ** i * 579.5 for i in range(dim)],  # sign-alternating
        [1e-8] * dim,                        # denormal-ish tiny norm
    ]
    extra_cols = {
        "vec_id": pa.array(
            [next_vid + i for i in range(len(specials))], pa.int64()
        ),
        "embedding": pa.array(
            [[float(np.float32(x)) for x in v] for v in specials],
            pa.list_(pa.float32()),
        ),
    }
    for c in names:
        if c not in extra_cols:
            # replicate the first row's value for any extra metadata col
            extra_cols[c] = pa.array(
                [emb.column(c)[0].as_py()] * len(specials),
                emb.schema.field(c).type,
            )
    pq.write_table(
        pa.concat_tables(
            [emb, pa.table({c: extra_cols[c] for c in names})]
        ),
        os.path.join(DST, "embeddings.parquet"),
    )
    print(f"hostile corpus at {DST}: +{len(texts)} documents, "
          f"+{len(specials)} embeddings")


if __name__ == "__main__":
    main()
