#!/usr/bin/env python3
"""Measurement harness (NOT library code): times the PUBLIC reference
implementation (/root/reference/whisper_pandas.py, heidelbergcement/
whisper-pandas) reading the ref-scale fixture eagerly — plain and gzipped —
to complete the baseline envelope for BENCH_NOTES (VERDICT r7 #4).

The fixture is the byte-identical 82,785,664 B 3-archive file Bench.scala
synthesizes (graft_bench_ref.wsp in the JVM tmpdir) plus its .gz twin; run
any Bench first so both exist. Eager read = WhisperFile.read + to_frame of
every archive, the same work the Spark scan's groupBy-count does.

Usage: python3 tools/ref_gz_duel.py [passes]
"""
import json
import sys
import time

sys.path.insert(0, "/root/reference")
from whisper_pandas import WhisperFile  # noqa: E402

WSP = "/tmp/graft_bench_ref.wsp"
GZ = "/tmp/graft_bench_ref.wsp.gz"


def eager_read(path):
    t0 = time.perf_counter()
    wsp = WhisperFile.read(path)
    rows = sum(len(a.to_frame()) for a in wsp.archives)
    return time.perf_counter() - t0, rows


def main():
    passes = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    out = {}
    for key, path in (("py_ref_wsp", WSP), ("py_ref_gz", GZ)):
        samples = []
        rows = None
        for _ in range(passes):
            dt, rows = eager_read(path)
            samples.append(round(dt, 3))
        out[key + "_sec"] = min(samples)
        out[key + "_samples"] = samples
        out[key + "_rows"] = rows
    print(json.dumps(out))


if __name__ == "__main__":
    main()
