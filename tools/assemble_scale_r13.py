"""Assemble SCALE_r13.json from this round's sweep logs.

Round-13 extends the r11 assembler to THREE scale points (sf10 /
sf30 / sf100 — the sf100 decade is the round's new evidence, run on a
query subset: the three heaviest shuffle rows q09/q21/HLL plus
controls). Per (query, sf) the headline ``sec`` is the MIN over every
sample in every run (independent JVMs, multi-pass), the estimator the
host-noise protocol prescribes; all samples + host-speed probes are
archived per row. Ratios are reported for every consecutive SF pair
so super-linear rows are attributable to a specific decade.

    python tools/assemble_scale_r13.py /tmp/sweep_sf10.log \
        /tmp/sweep_sf30.log /tmp/sweep_sf100*.log > SCALE_r13.json
"""

from __future__ import annotations

import json
import statistics
import sys


def _samples(row: dict) -> tuple[list[float], list[float]]:
    if row.get("sec") is None:
        return [], []
    if "secs" in row:
        return row["secs"], row.get("probes_ms", [])
    return [row["sec"]], (
        [row["probe_ms"]] if row.get("probe_ms") is not None else []
    )


def main() -> int:
    runs = []
    for path in sys.argv[1:]:
        for line in open(path):
            if line.startswith('{"sf_dir"'):
                runs.append((path, json.loads(line)))

    by_sf: dict[str, dict] = {}
    for path, run in runs:
        sf_key = f"sf{run['sf']:g}"
        agg = by_sf.setdefault(sf_key, {"queries": {}, "runs": []})
        agg["runs"].append(
            {
                "log": path,
                "env": run.get("env"),
                "shuffle_partitions": run.get("shuffle_partitions"),
                "skipped_by_policy": run.get("skipped_by_policy", []),
            }
        )
        for name, row in run["queries"].items():
            q = agg["queries"].setdefault(
                name,
                {"secs": [], "probes_ms": [], "io_probes_ms": [],
                 "rows": None},
            )
            if row.get("skipped"):
                q["skipped"] = row["skipped"]
                q["reason"] = row.get("reason")
                continue
            secs, probes = _samples(row)
            q["secs"] += secs
            q["probes_ms"] += probes
            q["io_probes_ms"] += row.get("io_probes_ms", [])
            if row.get("rows") is not None:
                q["rows"] = row["rows"]
            if row.get("ok") is not None:
                q["ok"] = (
                    row["ok"]
                    if q.get("ok") is None
                    else (q["ok"] and row["ok"])
                )
        for name, q in agg["queries"].items():
            if q["secs"]:
                q["sec"] = min(q["secs"])

    out: dict = {
        "protocol": (
            "per-(query, sf) sec = min over all samples from every"
            " sweep run this round (independent JVMs, 2 timing passes"
            " each; min because hypervisor-neighbor noise only ever"
            " ADDS time — per-row cpu probes and 64 MB write+fsync io"
            " probes archived so dirty windows are inspectable)."
            " Round-13 note: all three SFs were REGENERATED this round"
            " (Zipf documents, clustered embeddings), so text/dedup/ANN"
            " row times are not comparable to SCALE_r12 absolute values"
            " — the cross-SF ratios within this file are the claim."
        ),
    }
    sf_keys = sorted(by_sf, key=lambda k: float(k[2:]))
    for sf_key in sf_keys:
        out[sf_key] = by_sf[sf_key]

    for lo, hi in zip(sf_keys, sf_keys[1:]):
        ratios = {}
        for name, q in by_sf[hi]["queries"].items():
            ql = by_sf[lo]["queries"].get(name)
            if q.get("sec") and ql and ql.get("sec"):
                ratios[name] = round(q["sec"] / ql["sec"], 2)
        out[f"ratios_{hi}_over_{lo}"] = ratios
        vals = sorted(ratios.values())
        if vals:
            out[f"ratio_summary_{hi}_over_{lo}"] = {
                "n": len(vals),
                "median": round(statistics.median(vals), 2),
                "max": vals[-1],
                "data_ratio": float(hi[2:]) / float(lo[2:]),
            }

    json.dump(out, sys.stdout, indent=1)
    print()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
