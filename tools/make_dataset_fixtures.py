"""Extract the reference's five bundled datasets (data/*.rda) into the
text formats its own ingestion script started from (data-raw/datasets.R:
libsvm for the sparse/libsvm-sourced sets, CSV for the rest), so the
Scala engine's readers ingest the REAL data end-to-end in tests.

Run from the repo root:  python3 tools/make_dataset_fixtures.py
Writes src/test/resources/datasets/ (committed fixtures — the upstream
URLs are unreachable from this environment, the .rda files are the data).
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from tools.rda_reader import (read_rda, vals, attrs, factor_strings,
                              dense_matrix, dgc_matrix, data_frame)

REF = "/root/reference/data"
OUT = "src/test/resources/datasets"


def fmt(v):
    if v is None:
        return ""
    if isinstance(v, float):
        return repr(v)
    return str(v)


def write_csv(path, colnames, cols):
    n = len(cols[0])
    with open(path, "w") as f:
        f.write(",".join(colnames) + "\n")
        for i in range(n):
            f.write(",".join(fmt(c[i]) for c in cols) + "\n")
    return n


def main():
    os.makedirs(OUT, exist_ok=True)
    manifest = {}

    # heart: dgCMatrix 270x18 + factor y -> libsvm (+1 presence / -1 absence),
    # the label convention of the libsvm source the reference ingested
    d = read_rda(f"{REF}/heart.rda")["heart"]
    x, y = vals(d)
    nr, nc, ii, pp, xx, colnames = dgc_matrix(x)
    ys = factor_strings(y)
    rows = [[] for _ in range(nr)]
    for c in range(nc):
        for k in range(pp[c], pp[c + 1]):
            rows[ii[k]].append((c + 1, xx[k]))
    with open(f"{OUT}/heart.libsvm", "w") as f:
        for i in range(nr):
            lbl = "+1" if ys[i] == "presence" else "-1"
            feats = " ".join(f"{j}:{fmt(v)}" for j, v in sorted(rows[i]))
            f.write(f"{lbl} {feats}\n")
    manifest["heart"] = {"rows": nr, "features": colnames,
                         "labels": sorted(set(ys)), "format": "libsvm"}

    # bodyfat: data.frame 252x13 + numeric y (Siri 1956) -> CSV
    d = read_rda(f"{REF}/bodyfat.rda")["bodyfat"]
    x, y = vals(d)
    names, cols = data_frame(x)
    n = write_csv(f"{OUT}/bodyfat.csv", ["siri"] + names, [vals(y)] + cols)
    manifest["bodyfat"] = {"rows": n, "features": names, "format": "csv"}

    # abalone: data.frame 211x9 + count y (rings) -> CSV
    d = read_rda(f"{REF}/abalone.rda")["abalone"]
    x, y = vals(d)
    names, cols = data_frame(x)
    n = write_csv(f"{OUT}/abalone.csv", ["rings"] + names, [vals(y)] + cols)
    manifest["abalone"] = {"rows": n, "features": names, "format": "csv"}

    # wine: dense matrix 178x13 + 3-level factor y -> CSV
    d = read_rda(f"{REF}/wine.rda")["wine"]
    x, y = vals(d)
    nr, nc, v, colnames = dense_matrix(x)
    cols = [[v[c * nr + i] for i in range(nr)] for c in range(nc)]
    n = write_csv(f"{OUT}/wine.csv", ["class"] + colnames,
                  [factor_strings(y)] + cols)
    manifest["wine"] = {"rows": n, "features": colnames,
                        "labels": sorted(set(factor_strings(y))),
                        "format": "csv"}

    # student: dense matrix 382x21 + 2-target y (math, portugese) -> CSV
    d = read_rda(f"{REF}/student.rda")["student"]
    x, y = vals(d)
    nr, nc, v, colnames = dense_matrix(x)
    cols = [[v[c * nr + i] for i in range(nr)] for c in range(nc)]
    ynr, ync, yv, ynames = dense_matrix(y)
    ycols = [[yv[c * ynr + i] for i in range(ynr)] for c in range(ync)]
    n = write_csv(f"{OUT}/student.csv", list(ynames) + list(colnames),
                  ycols + cols)
    manifest["student"] = {"rows": n, "features": colnames,
                           "targets": ynames, "format": "csv"}

    with open(f"{OUT}/manifest.json", "w") as f:
        json.dump(manifest, f, indent=2, sort_keys=True)
    for k, v in sorted(manifest.items()):
        print(k, v["rows"], "rows,", len(v["features"]), "features")


if __name__ == "__main__":
    main()
