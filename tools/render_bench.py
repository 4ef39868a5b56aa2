#!/usr/bin/env python3
"""Render benchmark numbers into the docs from ONE committed artifact.

VERDICT r4 #2: every performance figure in README.md / PARITY.md must
come from a bench artifact, not from hand-edited prose that drifts.
Docs carry inline markers

    <!--bench:KEY-->...<!--/bench-->          (grouped integer)
    <!--bench:KEY:.1f-->...<!--/bench-->      (explicit format)

whose inner text this tool rewrites from the artifact's configs dict
(BENCH_r*.json layout: {"parsed": {"configs": {...}}} or the bare
bench.py JSON line).  Run with --check in CI to fail on drift.

    python tools/render_bench.py BENCH_local.json --write
    python tools/render_bench.py BENCH_r05.json --check
"""
import argparse
import json
import os
import re
import sys

DOCS = ("README.md", "PARITY.md")
MARK = re.compile(
    r"(<!--bench:(?P<key>[a-z0-9_]+)(?::(?P<fmt>[^>]+))?-->)"
    r"(?P<body>.*?)(<!--/bench-->)", re.S)


def load_configs(path):
    data = json.load(open(path))
    if "parsed" in data:
        data = data["parsed"]
    cfg = dict(data.get("configs", {}))
    cfg["headline_value"] = data.get("value")
    cfg["vs_baseline"] = data.get("vs_baseline")
    return cfg


def fmt_value(v, fmt):
    if fmt:
        return format(v, fmt)
    if isinstance(v, float) and v == int(v):
        v = int(v)
    if isinstance(v, int) or (isinstance(v, float) and abs(v) >= 1000):
        return format(int(round(v)), ",")
    return str(v)


def render(text, cfg, path):
    missing = []

    def sub(m):
        key = m.group("key")
        if key not in cfg:
            missing.append(key)
            return m.group(0)
        return (m.group(1) + fmt_value(cfg[key], m.group("fmt"))
                + m.group(5))

    out = MARK.sub(sub, text)
    for k in missing:
        print(f"{path}: no artifact value for marker '{k}'",
              file=sys.stderr)
    return out, missing


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("artifact")
    ap.add_argument("--write", action="store_true")
    ap.add_argument("--check", action="store_true")
    args = ap.parse_args()
    cfg = load_configs(args.artifact)
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    drift = False
    for name in DOCS:
        p = os.path.join(root, name)
        text = open(p).read()
        out, missing = render(text, cfg, name)
        if out != text:
            drift = True
            if args.write:
                open(p, "w").write(out)
                print(f"updated {name}")
            else:
                print(f"{name}: stale bench figures"
                      + (" (run with --write)" if not args.check else ""))
        if missing:
            drift = True
    if args.check and drift:
        sys.exit(1)
    if not drift:
        print("docs match the artifact")


if __name__ == "__main__":
    main()
