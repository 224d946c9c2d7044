"""Per-query bench regression diff (VERDICT r3 #5).

Compares two bench payloads ({"queries": {name: sec}, ...}) and renders a
drift table so "noise vs regression" stops being a judgment call: queries
whose ratio exceeds DRIFT_RATIO in either direction are flagged, new and
removed queries are listed, and totals are recomputed over the common set
(so adding headline queries doesn't read as a slowdown).

CLI:
    python tools/bench_diff.py                # latest two BENCH_r*.json
    python tools/bench_diff.py OLD.json NEW.json

Accepts both the raw bench.py JSON line and the driver's BENCH_r{N}.json
wrapper (payload under "parsed"). bench.py calls diff_table() after its
JSON line (on stderr) against the newest BENCH_r*.json in the repo root.
"""

from __future__ import annotations

import glob
import json
import os
import sys

# min-of-two-pass timings on this box still show real scheduler noise;
# 1.3x is outside that band for everything but the sub-0.3 s microqueries,
# which the floor guard below absorbs.
DRIFT_RATIO = 1.3
# ignore drifts where both sides are this fast — a 0.1 s -> 0.2 s "2x
# regression" is pure scheduling jitter, not a plan change.
FLOOR_SEC = 0.3


def _payload(doc: dict) -> dict:
    # The driver wrapper carries "parsed": null when the bench run crashed
    # (e.g. BENCH_r04); treat that as an empty payload rather than erroring.
    inner = doc.get("parsed", doc)
    return inner if isinstance(inner, dict) else {}


def _calp_median_sum(payload: dict) -> float | None:
    """Median of the positional probe-trio sums ([start, mid, end] of
    jvm+scan+jvms), or None when the payload carries no usable calp
    list (pre-r15 records)."""
    import statistics

    v = payload.get("calp")
    if not (
        isinstance(v, list)
        and len(v) >= 2
        and all(isinstance(x, (int, float)) and x > 0 for x in v)
    ):
        return None
    return statistics.median(v)


def calib_factor(old_doc: dict, new_doc: dict) -> float | None:
    """Machine-speed ratio new/old from the fixed-work calibration probes
    (VERDICT r8 #1). Both payloads must carry a non-empty ``calib`` block
    ({"jvm": sec, "scan": sec} — pure-JVM codegen job + pinned lineitem
    scan, constant work across rounds); returns None otherwise, in which
    case the diff falls back to raw ratios (pre-r9 records have no calib).

    r15: when BOTH payloads carry ``calp`` (positional probe-trio sums
    [start, mid, end]), the factor uses the MEDIAN across positions
    instead of calib's min — a single front-loaded probe undercorrects
    contention that arrives mid-payload (the r13 lang_id and r14
    broad-band adjudications), and the median of three interleaved
    samples tracks the load the queries actually ran under.
    """
    med = _calp_median_sum(_payload(old_doc)), _calp_median_sum(
        _payload(new_doc)
    )
    if med[0] is not None and med[1] is not None:
        return med[1] / med[0]

    oc = _payload(old_doc).get("calib") or {}
    nc = _payload(new_doc).get("calib") or {}

    # The probe SET must be identical in both payloads: summing whatever
    # happens to be there would silently compare mismatched sets
    # (jvm+scan+jvms vs jvm+scan) and skew the normalization factor.
    # Prefer the r12+ sustained set when both sides carry it — the 3 s
    # jvms probe dominates the sum and samples the throttling regime the
    # queries actually run in (the sub-second probes are point samples
    # that measured 2x noisier than the query totals in r12's
    # back-to-back runs); fall back to jvm+scan against pre-r12 records.
    def _sum(keys):
        probes = []
        for c in (oc, nc):
            vals = [c.get(k) for k in keys]
            if not all(isinstance(v, (int, float)) and v > 0 for v in vals):
                return None
            probes.append(sum(vals))
        return probes

    probes = _sum(["jvm", "scan", "jvms"]) or _sum(["jvm", "scan"])
    if probes is None:
        return None
    o, n = probes
    return n / o


def diff_table(old_doc: dict, new_doc: dict, old_label: str = "old", new_label: str = "new") -> str:
    old = _payload(old_doc).get("queries", {})
    new = _payload(new_doc).get("queries", {})
    common = sorted(set(old) & set(new))
    added = sorted(set(new) - set(old))
    removed = sorted(set(old) - set(new))

    # When both rounds recorded calibration probes, drift is judged on the
    # calibration-NORMALIZED ratio (raw ratio / machine-speed ratio): a
    # uniformly loaded sandbox inflates every raw ratio equally and the
    # probes cancel it out, so only genuine plan drift gets flagged.
    cf = calib_factor(old_doc, new_doc)

    lines = []
    width = max((len(n) for n in common), default=10)
    if cf is not None:
        lines.append(
            f"calibration: machine-speed ratio {new_label}/{old_label} = "
            f"{cf:.2f}x — flags below are on the normalized column"
        )
        lines.append(
            f"{'query'.ljust(width)}  {old_label:>9}  {new_label:>9}  "
            f"{'ratio':>6}  {'norm':>6}  flag"
        )
    else:
        lines.append(
            f"{'query'.ljust(width)}  {old_label:>9}  {new_label:>9}  {'ratio':>6}  flag"
        )
    flagged = 0
    for name in common:
        o, n = old[name], new[name]
        ratio = n / o if o else float("inf")
        judged = ratio / cf if cf else ratio
        flag = ""
        if max(o, n) >= FLOOR_SEC:
            if judged > DRIFT_RATIO:
                flag = "REGRESSION"
                flagged += 1
            elif judged < 1 / DRIFT_RATIO:
                flag = "improved"
        if cf is not None:
            lines.append(
                f"{name.ljust(width)}  {o:9.3f}  {n:9.3f}  {ratio:6.2f}  "
                f"{judged:6.2f}  {flag}"
            )
        else:
            lines.append(
                f"{name.ljust(width)}  {o:9.3f}  {n:9.3f}  {ratio:6.2f}  {flag}"
            )
    tot_old = sum(old[n] for n in common)
    tot_new = sum(new[n] for n in common)
    tot_ratio = tot_new / tot_old if tot_old else 1
    tail = f"{tot_ratio:6.2f}  "
    if cf is not None:
        tail += f"{tot_ratio / cf:6.2f}  "
    lines.append(
        f"{('TOTAL (%d common)' % len(common)).ljust(width)}  "
        f"{tot_old:9.3f}  {tot_new:9.3f}  "
        + tail
        + f"{flagged} flagged >{DRIFT_RATIO}x"
        + (" (normalized)" if cf is not None else "")
    )
    if added:
        lines.append(f"added ({len(added)}): {', '.join(added)}")
    if removed:
        lines.append(f"removed ({len(removed)}): {', '.join(removed)}")
    return "\n".join(lines)


def latest_bench_files(repo_root: str, n: int = 2) -> list[str]:
    """Newest n bench files that actually contain per-query timings
    (crashed rounds persist a wrapper with "parsed": null — skip those)."""
    files = []
    for path in sorted(glob.glob(os.path.join(repo_root, "BENCH_r*.json"))):
        try:
            with open(path) as fh:
                if _payload(json.load(fh)).get("queries"):
                    files.append(path)
        except (OSError, json.JSONDecodeError):
            continue
    return files[-n:]


def write_md(old_path: str, new_path: str, out_path: str) -> None:
    """Persist the full normalized diff table as a committed markdown
    artifact (VERDICT r10 #6): the driver's transcript tail guard
    truncates long stdout, so the adjudication table must live in the
    repo, not the transport."""
    with open(old_path) as fh:
        old = json.load(fh)
    with open(new_path) as fh:
        new = json.load(fh)
    ol = os.path.basename(old_path).replace(".json", "")
    nl = os.path.basename(new_path).replace(".json", "")
    table = diff_table(old, new, old_label=ol, new_label=nl)
    with open(out_path, "w") as fh:
        fh.write(
            f"# Bench diff: {ol} -> {nl}\n\n"
            f"Generated by `python tools/bench_diff.py --md {out_path} "
            f"{old_path} {new_path}`. Ratios are per-query new/old; the\n"
            f"`norm` column divides out the machine-speed ratio measured\n"
            f"by the fixed-work calibration probes carried in both\n"
            f"payloads, so flags mean plan drift, not sandbox load.\n\n"
            f"```\n{table}\n```\n"
        )


def main(argv: list[str]) -> int:
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    if argv[:1] == ["--md"]:
        out = argv[1]
        paths = argv[2:] if len(argv) == 4 else latest_bench_files(root)
        write_md(paths[0], paths[1], out)
        print(f"wrote {out}")
        return 0
    if len(argv) == 2:
        paths = argv
    else:
        paths = latest_bench_files(root)
        if len(paths) < 2:
            print("need two BENCH_r*.json files (or pass OLD NEW)", file=sys.stderr)
            return 1
    with open(paths[0]) as fh:
        old = json.load(fh)
    with open(paths[1]) as fh:
        new = json.load(fh)
    print(
        diff_table(
            old,
            new,
            old_label=os.path.basename(paths[0]).replace(".json", ""),
            new_label=os.path.basename(paths[1]).replace(".json", ""),
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
