#!/usr/bin/env python3
"""Independent golden-row generator for the x_multimodal_pipeline oracle.

Re-implements the documented stub laws of graft.operators.Multimodal and
the exact-integer ANN ranking of Similarity.bruteForceTopKExact using only
hashlib/numpy — no JVM involved — so the catalog's VALUES oracle is derived
independently of the engine under test.

Laws replayed (see Multimodal.scala / Similarity.scala):
  fixture   : payload(i) = ("graft-media-" + i + ":") * (i % 7 + 1), ids 0..39
  decode    : non-empty payload -> decode_ok (gate only; metadata unused here)
  resize    : seed = sha256(payload ++ ":64:64"), out[i] = seed[i % 32],
              len = max(32, 64*64/8) = 512
  features  : raw[d] = float32(int32_be(sha256(out ++ ":f"+d)[0:4])) /
              float32(2^31-1); norm = sqrt(sum((double)x * x)); emb[d] =
              float32((double)raw[d] / norm)   (dim = 16)
  quantize  : q[d] = round_half_up((double)emb[d] * 10000)  -> long
  ranking   : key = sign(dot) * dot^2 / n2 (one IEEE multiply+divide over
              exact ints); top-3 per query id<5, ties by neighbor_id asc,
              self-match excluded

Usage: python3 tools/golden_multimodal.py  -> prints the DuckDB VALUES SQL.
"""
import hashlib
import math
from decimal import Decimal, ROUND_HALF_UP

import numpy as np

DIM = 16
K = 3
N = 40
NQ = 5


def payload(i: int) -> bytes:
    return (f"graft-media-{i}:" * (i % 7 + 1)).encode("utf-8")


def resize(b: bytes, w: int = 64, h: int = 64) -> bytes:
    seed = hashlib.sha256(b + f":{w}:{h}".encode()).digest()
    n = max(32, w * h // 8)
    return bytes(seed[i % len(seed)] for i in range(n))


def features(b: bytes, dim: int = DIM):
    raw = []
    for d in range(dim):
        hd = hashlib.sha256(b + f":f{d}".encode()).digest()
        x = int.from_bytes(hd[:4], "big", signed=True)
        # JVM: x.toFloat / Int.MaxValue.toFloat  (float32 division)
        raw.append(np.float32(x) / np.float32(2147483647))
    # JVM: raw.map(x => x.toDouble * x).sum  (left-fold in double)
    norm = math.sqrt(sum(float(x) * float(x) for x in raw))
    if norm == 0:
        return raw
    # JVM: (x / norm).toFloat  (double divide, round to float32)
    return [np.float32(float(x) / norm) for x in raw]


def quant(v) -> int:
    # Spark round() on double = BigDecimal(Double.toString(d)) HALF_UP;
    # python repr() is the same shortest round-trip decimal string
    d = float(v) * 10000.0
    return int(Decimal(repr(d)).quantize(Decimal("1"), rounding=ROUND_HALF_UP))


def main() -> None:
    vecs = {}
    for i in range(N):
        p = payload(i)
        if len(p) == 0:  # decode gate: stub rejects only empty payloads
            continue
        emb = features(resize(p))
        vecs[i] = [quant(x) for x in emb]

    rows = []
    for qid in sorted(vecs):
        if qid >= NQ:
            break
        qv = vecs[qid]
        scored = []
        for nid, cv in vecs.items():
            if nid == qid:
                continue
            dot = sum(a * b for a, b in zip(cv, qv))
            n2 = sum(a * a for a in cv)
            if n2 == 0:
                key = -math.inf
            else:
                key = float(dot) * float(dot) / float(n2)
                if dot < 0:
                    key = -key
            scored.append((-key, nid, dot, n2))
        scored.sort()
        for rank, (_, nid, dot, n2) in enumerate(scored[:K], start=1):
            rows.append((qid, nid, rank, dot, n2))

    print("SELECT * FROM (VALUES")
    body = ",\n".join(
        f"  ({q}::BIGINT, {n}::BIGINT, {r}::INT, {d}::BIGINT, {n2}::BIGINT)"
        for q, n, r, d, n2 in rows
    )
    print(body)
    print(") AS t(query_id, neighbor_id, rank, dot, n2)")
    print("-- ORDER BY query_id, rank")


if __name__ == "__main__":
    main()
