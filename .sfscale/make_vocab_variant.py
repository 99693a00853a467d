"""Vocabulary-growing variants of the scaling corpora (VERDICT r6
'Next round' #6): the base synthetic corpus has a FLAT 31-token
vocabulary and the consonant-rotation sf1 grows it linearly (31→301)
— both unrealistic for operators whose cost keys on distinct-term
cardinality (BM25 postings width, classifier vocab, winnow fp
distribution).

This script writes .sfscale/sf0.1v and .sfscale/sf1v: the same
document sets as sf0.1 / sf1 (same doc ids, same token counts per
doc), but every token occurrence maps to a Zipf variant
``tok + str(r)`` with r = floor(u^(-1/2)) drawn from the occurrence's
md5 (deterministic).  P(r ≥ x) = x⁻² gives:

- a Zipf-like type-frequency distribution (75% of occurrences take
  r=1 — the shared high-df core; hapax-legomena tail),
- Heaps-law vocabulary growth: distinct types among n draws ∝ √n,
  so the 10× corpus step grows vocabulary ~3.2× instead of 1×/10×,
- cross-replica sharing of the common types (r=1,2,…) so document
  frequency distributions look like a real crawl, not 10 disjoint
  vocabularies.

Only `documents` differs from the base datasets; all other tables are
copied/symlinked unchanged so every bench query runs on both."""
import hashlib
import os
import shutil

import pyarrow as pa
import pyarrow.parquet as pq

HERE = os.path.dirname(os.path.abspath(__file__))
PAIRS = [
    ("/root/testdata/sf0.1", f"{HERE}/sf0.1v"),
    (f"{HERE}/sf1", f"{HERE}/sf1v"),
]
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "embeddings",
]


def variant(tok: str, doc_id: int, j: int) -> str:
    h = hashlib.md5(f"{doc_id}:{j}:{tok}".encode()).hexdigest()
    u = (int(h[:12], 16) + 1) / float(1 << 48)
    r = int(u ** -0.5)
    return f"{tok}{r}"


def rewrite_docs(src: str, dst: str, replicas: int = 1) -> None:
    """Variant-map the BASE (unrotated) text: for the 10× set the
    replicas are key-offset copies of the base docs — the variant
    draws are doc_id-seeded, so replicas are textually distinct
    through the same 31-type base vocabulary, and growth comes only
    from the Heaps draw, never from a per-replica bijection."""
    t = pq.read_table(f"{src}/documents.parquet")
    base_ids = t.column("doc_id").to_pylist()
    texts = t.column("text").to_pylist()
    ids_out, txt_out = [], []
    for i in range(replicas):
        for d, text in zip(base_ids, texts):
            did = d + i * 100_000_000
            ids_out.append(did)
            if text is None:
                txt_out.append(None)
                continue
            toks = text.split()
            txt_out.append(
                " ".join(variant(tok, did, j) for j, tok in enumerate(toks))
            )
    other = {
        name: pa.concat_arrays(
            [t.column(name).combine_chunks()] * replicas
        )
        for name in t.schema.names
        if name not in ("doc_id", "text")
    }
    out = pa.table(
        {
            "doc_id": pa.array(ids_out, type=pa.int64()),
            "text": pa.array(txt_out, type=pa.string()),
            **other,
        }
    )
    pq.write_table(out, f"{dst}/documents.parquet", row_group_size=200_000)


if __name__ == "__main__":
    for (src, dst), reps, text_src in zip(
        PAIRS, (1, 10), ("/root/testdata/sf0.1", "/root/testdata/sf0.1")
    ):
        os.makedirs(dst, exist_ok=True)
        for name in TABLES:
            if not os.path.exists(f"{dst}/{name}.parquet"):
                shutil.copy(f"{src}/{name}.parquet", f"{dst}/{name}.parquet")
        rewrite_docs(text_src, dst, replicas=reps)
        n = pq.read_metadata(f"{dst}/documents.parquet").num_rows
        print(dst, "documents:", n)
