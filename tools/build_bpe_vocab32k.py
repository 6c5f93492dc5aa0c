"""Offline byte-level BPE trainer at production vocabulary scale:
learns a pinned >=32k-entry merges table from the documents corpus and
writes it as a generated data module.

    python tools/build_bpe_vocab32k.py [--sf-dir /root/testdata/sf0.1] \
        [--n-merges 32768] [--out .../functions/bpe_vocab_32k.py]

Same training posture as ``tools/build_bpe_merges.py`` (classic BPE,
Sennrich et al. 2016, byte level, NO pre-tokenization — spaces are
ordinary symbols, so merges learn multi-word phrases), and the SAME
deterministic rule: each round merges the most frequent adjacent
pair, ties broken by lexicographically smallest pair string.

Training runs with ``min_frequency=1`` (the HuggingFace-tokenizers
BPETrainer default); ``FREQ2_MERGES`` in the artifact records how
many merges were selected at count >= 2 before any singleton merge.
History: the pre-round-13 corpus (uniform draws over a 30-word
vocabulary) saturated its repeat structure near 18.7k merges, leaving
the vocabulary tail trained on singletons; the round-13 Zipf-mixture
corpus (50k word types, rank^-1.07 frequencies — see
``tools/gen_testdata.py``) supports the FULL 32,768 merges at
count >= 2 (``FREQ2_MERGES == N_MERGES``), so the pinned vocabulary's
tail is now real repeat structure, not noise.

What differs is the ALGORITHM, not the result: the naive trainer
recounts every pair over the whole corpus each round — O(rounds x
corpus), hopeless at 32k rounds — while this one maintains incremental
pair statistics over a doubly-linked symbol list (the standard fast
BPE trainer):

- ``pair_positions[pair]`` = set of left-symbol indices where the pair
  occurs; ``pair_counts[pair]`` = adjacent-occurrence count (overlap-
  inclusive, identical to the naive trainer's statistic);
- a lazy max-heap of ``(-count, pair)`` entries, re-pushed whenever a
  count changes, validated against the live count on pop (stale
  entries are discarded) — pop order is exactly "max count, then
  lexicographically smallest pair";
- applying a merge touches only its occurrences and their immediate
  neighbors, so total work is O(corpus + total merge applications).

``tests/test_bpe32k.py`` pins this trainer's merge sequence equal to
the naive ``build_bpe_merges.train`` on small corpora.

Merged token i is ``chr(0xF0000 + i)`` — Supplementary Private Use
Area-A (65534 code points), absent from the ASCII corpus, so the
1-char-per-token mapped-string invariant (and with it the rank-order
replace-chain equivalence proof in ``functions/bpe.py``) carries over
unchanged to a 32k vocabulary.

The output module is COMMITTED (a pinned vocabulary artifact, like a
shipped tokenizer.json); rerunning this script on the same corpus
reproduces it byte-for-byte. Pairs are stored as one concatenated
2-chars-per-merge string, base64(UTF-8) so the generated source stays
pure ASCII.
"""

from __future__ import annotations

import argparse
import base64
import heapq
import os

PUA32_BASE = 0xF0000

DEFAULT_OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "aind_exaspim_data_transformation_spark",
    "functions",
    "bpe_vocab_32k.py",
)


def train(
    texts: list[str],
    n_merges: int,
    pua_base: int = PUA32_BASE,
    min_frequency: int = 2,
    counts_out: list[int] | None = None,
) -> list[tuple[str, str]]:
    """Incremental-statistics BPE training; returns the same
    ``[(pair, merged_char), ...]`` sequence the naive trainer would.

    ``min_frequency`` is the classic stop threshold: 2 reproduces the
    Sennrich-script behavior (stop when no pair repeats) and the
    256-merge table's posture; 1 is the HuggingFace-tokenizers default
    and keeps merging singleton pairs (max count first, so every
    freq>=2 merge still precedes every freq-1 merge; ties stay
    lexicographic). ``counts_out``, if given, receives each merge's
    selection-time count so the artifact can record where the
    freq>=2 regime ends."""
    # One flat symbol array; None sentinels separate documents so no
    # pair spans a doc boundary. prv/nxt form a doubly-linked list.
    sym: list[str | None] = []
    for t in texts:
        sym.extend(t)
        sym.append(None)
    n = len(sym)
    nxt = list(range(1, n + 1))
    prv = list(range(-1, n))

    pair_counts: dict[str, int] = {}
    pair_positions: dict[str, set[int]] = {}
    for i in range(n - 1):
        a, b = sym[i], sym[i + 1]
        if a is None or b is None:
            continue
        p = a + b
        pair_counts[p] = pair_counts.get(p, 0) + 1
        pair_positions.setdefault(p, set()).add(i)

    # Lazy max-heap: (-count, pair). Entries go stale as counts move;
    # a popped entry is honored only if it matches the live count.
    heap = [(-c, p) for p, c in pair_counts.items() if c >= min_frequency]
    heapq.heapify(heap)

    def bump(p: str, delta: int, pos: int | None, add: bool) -> None:
        c = pair_counts.get(p, 0) + delta
        pair_counts[p] = c
        if add:
            pair_positions.setdefault(p, set()).add(pos)
        elif pos is not None:
            pair_positions.get(p, set()).discard(pos)
        if c >= min_frequency:
            heapq.heappush(heap, (-c, p))

    merges: list[tuple[str, str]] = []
    while len(merges) < n_merges and heap:
        negc, pair = heapq.heappop(heap)
        if pair_counts.get(pair, 0) != -negc or -negc < min_frequency:
            continue  # stale entry
        merged = chr(pua_base + len(merges))
        merges.append((pair, merged))
        if counts_out is not None:
            counts_out.append(-negc)
        a, b = pair[0], pair[1]
        for i in sorted(pair_positions.get(pair, ())):
            # Validate: a prior application this round may have
            # consumed this occurrence (overlapping run, e.g. "aaa").
            if sym[i] != a:
                continue
            j = nxt[i]
            if j >= n or sym[j] != b:
                continue
            l, k = prv[i], nxt[j]
            bump(pair, -1, i, add=False)
            if l >= 0 and sym[l] is not None:
                bump(sym[l] + a, -1, l, add=False)
            if k < n and sym[k] is not None:
                bump(b + sym[k], -1, j, add=False)
            sym[i], sym[j] = merged, None
            nxt[i] = k
            if k < n:
                prv[k] = i
            if l >= 0 and sym[l] is not None:
                bump(sym[l] + merged, +1, l, add=True)
            if k < n and sym[k] is not None:
                bump(merged + sym[k], +1, i, add=True)
        pair_positions.pop(pair, None)
    return merges


def main() -> None:
    ap = argparse.ArgumentParser()
    # Default training corpus: the first 12k docs (doc_id order) of the
    # sf10 documents table as produced by `tools/gen_testdata.py --sf 10`
    # (seeded generator, byte-reproducible). sf0.1's 1.49M chars top out
    # at ~17k merges with freq>=2; ~3.6M chars comfortably support the
    # full 32768-merge vocabulary.
    ap.add_argument("--sf-dir", default=".localdata/sf10")
    ap.add_argument("--max-docs", type=int, default=12000)
    ap.add_argument("--n-merges", type=int, default=32768)
    ap.add_argument("--out", default=DEFAULT_OUT)
    args = ap.parse_args()

    import duckdb

    path = os.path.join(args.sf_dir, "documents.parquet")
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT text FROM read_parquet('{path}') "
        f"ORDER BY doc_id LIMIT {int(args.max_docs)}"
    ).fetchall()
    texts = [r[0] for r in rows]
    bad = [t for t in texts if any(not 0x20 <= ord(c) <= 0x7E for c in t)]
    if bad:
        raise SystemExit("corpus is not pure printable ASCII; byte!=char")

    counts: list[int] = []
    merges = train(texts, args.n_merges, min_frequency=1, counts_out=counts)
    if len(merges) > 0xFFFE:
        raise SystemExit("merge count exceeds the plane-15 PUA range")
    freq2 = sum(1 for c in counts if c >= 2)

    packed = "".join(pair for pair, _ in merges)
    b64 = base64.b64encode(packed.encode("utf-8")).decode("ascii")
    lines = [b64[i : i + 76] for i in range(0, len(b64), 76)]
    body = "\n".join(f'    "{ln}"' for ln in lines)
    with open(args.out, "w") as f:
        f.write(
            '"""Pinned production-scale BPE merges table — GENERATED by\n'
            "tools/build_bpe_vocab32k.py; do not edit by hand.\n"
            "Regenerating on the same corpus reproduces this file\n"
            "byte-for-byte.\n\n"
            f"Trained on: {path} ({len(texts)} docs,\n"
            f"{sum(len(t) for t in texts)} chars), "
            f"{len(merges)} merges\n"
            f"(min_frequency=1, HF-tokenizers default; the first\n"
            f"{freq2} merges were selected at count >= 2, the rest\n"
            "are deterministic singleton merges — see the trainer\n"
            "docstring for why this corpus requires that posture).\n\n"
            "PAIRS_B64 decodes (base64 -> UTF-8) to one string of\n"
            "concatenated 2-codepoint merge pairs in rank order; merge\n"
            "i's output token is chr(PUA32_BASE + i). See\n"
            "functions/bpe32k.py for the loader and encoder.\n"
            '"""\n\n'
            f"TRAIN_CORPUS = "
            f"{os.path.basename(args.sf_dir) + f'[:{args.max_docs}]'!r}\n"
            f"TRAIN_DOCS = {len(texts)}\n"
            f"N_MERGES = {len(merges)}\n"
            f"FREQ2_MERGES = {freq2}\n"
            f"PUA32_BASE = {PUA32_BASE:#x}\n\n"
            "PAIRS_B64 = (\n"
            f"{body}\n)\n"
        )
    print(f"wrote {len(merges)} merges -> {args.out}")


if __name__ == "__main__":
    main()
