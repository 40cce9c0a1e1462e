"""Minimal RData (.rda) reader for the reference's bundled datasets.

Parses the documented R serialization format (R Internals, "Serialization
Formats": RDX2 header + XDR binary stream) far enough to materialize the
subset those files actually use: named lists, numeric/integer/string
vectors, factors, data.frames, dense matrices and dgCMatrix sparse
matrices (S4). Pure stdlib; used once by make_dataset_fixtures.py to turn
data/*.rda into CSV/libsvm fixtures the Scala readers ingest.
"""
import bz2
import struct

# SEXP type codes (R Internals, serialize.c)
NILSXP = 0
SYMSXP = 1
LISTSXP = 2
CHARSXP = 9
LGLSXP = 10
INTSXP = 13
REALSXP = 14
CPLXSXP = 15
STRSXP = 16
VECSXP = 19
RAWSXP = 24
S4SXP = 25
ALTREP = 238
NILVALUE = 254
REFSXP = 255
NA_INT = -2147483648


class RdaParser:
    def __init__(self, data: bytes):
        self.d = data
        self.pos = 0
        self.refs = []

    def u4(self):
        v = struct.unpack_from(">i", self.d, self.pos)[0]
        self.pos += 4
        return v

    def f8(self):
        v = struct.unpack_from(">d", self.d, self.pos)[0]
        self.pos += 8
        return v

    def raw(self, n):
        v = self.d[self.pos:self.pos + n]
        self.pos += n
        return v

    def length(self):
        n = self.u4()
        if n == -1:  # long vector: two-word length
            hi, lo = self.u4(), self.u4()
            n = (hi << 32) | lo
        return n

    def parse(self):
        assert self.d[:5] == b"RDX2\n", "not an RDX2 rda file"
        assert self.d[5:7] == b"X\n", "not XDR-encoded"
        self.pos = 7
        self.u4()  # format version
        self.u4()  # writer R version
        self.u4()  # min reader R version
        return self.item()

    def item(self):
        flags = self.u4()
        typ = flags & 255
        has_attr = bool(flags & 0x200)
        has_tag = bool(flags & 0x400)

        if typ == NILVALUE or typ == NILSXP:
            return None
        if typ == REFSXP:
            idx = flags >> 8
            if idx == 0:
                idx = self.u4()
            return self.refs[idx - 1]
        if typ == SYMSXP:
            name = self.item()  # CHARSXP
            self.refs.append(name)
            return name
        if typ == CHARSXP:
            n = self.u4()
            if n == -1:
                return None  # NA_character_
            return self.raw(n).decode("utf-8", "replace")
        if typ == LISTSXP:  # pairlist node
            attr = self.item() if has_attr else None
            tag = self.item() if has_tag else None
            car = self.item()
            cdr = self.item()  # NILVALUE-terminated
            out = [(tag, car)]
            if isinstance(cdr, list):
                out.extend(cdr)
            return out
        if typ in (LGLSXP, INTSXP):
            n = self.length()
            vals = [self.u4() for _ in range(n)]
            vals = [None if v == NA_INT else v for v in vals]
            return self.with_attrs(vals, has_attr)
        if typ == REALSXP:
            n = self.length()
            vals = [self.f8() for _ in range(n)]
            return self.with_attrs(vals, has_attr)
        if typ == STRSXP:
            n = self.length()
            vals = [self.item() for _ in range(n)]
            return self.with_attrs(vals, has_attr)
        if typ == VECSXP:
            n = self.length()
            vals = [self.item() for _ in range(n)]
            return self.with_attrs(vals, has_attr)
        if typ == RAWSXP:
            n = self.length()
            return self.with_attrs(self.raw(n), has_attr)
        if typ == S4SXP:
            attrs = self.item()  # slots as a pairlist
            return {"_s4": True, "_attrs": dict_of(attrs)}
        raise ValueError(f"unhandled SEXP type {typ} at offset {self.pos}")

    def with_attrs(self, vals, has_attr):
        if not has_attr:
            return vals
        attrs = self.item()
        return {"_vals": vals, "_attrs": dict_of(attrs)}


def dict_of(pairlist):
    if pairlist is None:
        return {}
    return {tag: car for tag, car in pairlist}


def read_rda(path):
    """-> dict of top-level objects (an .rda holds a named pairlist)."""
    data = bz2.open(path, "rb").read()
    top = RdaParser(data).parse()
    return dict_of(top)


# --- convenience views over the parsed structures -------------------------

def vals(x):
    return x["_vals"] if isinstance(x, dict) and "_vals" in x else x


def attrs(x):
    return x.get("_attrs", {}) if isinstance(x, dict) else {}


def factor_strings(x):
    """INTSXP with levels -> list of level strings (1-based codes)."""
    levels = [s for s in vals(attrs(x)["levels"])]
    return [None if c is None else levels[c - 1] for c in vals(x)]


def dense_matrix(x):
    """REALSXP with dim -> (rows, cols, column-major values, dimnames)."""
    nr, nc = vals(attrs(x)["dim"])[:2]
    dn = attrs(x).get("dimnames")
    colnames = None
    if dn is not None and vals(dn)[1] is not None:
        colnames = [s for s in vals(vals(dn)[1])]
    return nr, nc, vals(x), colnames


def dgc_matrix(x):
    """dgCMatrix S4 -> (rows, cols, i, p, x, colnames) in CSC layout."""
    sl = x["_attrs"]
    nr, nc = vals(sl["Dim"])[:2]
    dn = vals(sl["Dimnames"])
    colnames = None
    if dn[1] is not None:
        colnames = [s for s in vals(dn[1])]
    return nr, nc, vals(sl["i"]), vals(sl["p"]), vals(sl["x"]), colnames


def data_frame(x):
    """VECSXP data.frame -> (colnames, list of column value-lists)."""
    names = [s for s in vals(attrs(x)["names"])]
    cols = []
    for c in vals(x):
        if isinstance(c, dict) and "levels" in attrs(c):
            cols.append(factor_strings(c))
        else:
            cols.append(vals(c))
    return names, cols
