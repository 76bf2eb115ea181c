#!/usr/bin/env python3
"""Independent golden-row generator for the fn_opaque_codecs oracle.

Re-implements every opaque-codec law the query exercises using only the
python standard library — no JVM involved — so the catalog's VALUES oracle
is derived independently of the engine under test:

  farmhash64  : FarmHash Fingerprint64 (public farmhashna::Hash64 spec;
                the reference fingerprints asset rows with it, asset.go)
  fnv64a      : FNV-1a 64-bit over UTF-8 bytes
  asset_id    : farmhash64(code + issuer + type), transform/asset.go:72-77
  strkey_like : base32(0x30 ‖ sha256(name) ‖ crc16-xmodem-LE), no padding
  i128        : ((hi << 64) + unsigned(lo)) as a decimal string
  rolling_hash: fold acc*31 + codepoint over the normalized text (lower,
                collapse whitespace, trim) in wrapping int64 arithmetic
                (graft.codec.Hashes.rollingHash64)
  n_subwords  : count of non-empty tokens after splitting on the camel /
                whitespace / alnum-boundary regex of
                TextAnalysis.subwordCountEstimate

Fixture law (mirrored by the Spark side of the query):
  i in 0..7   : name = "zQ7#xY9w"[:i]          (every short-input branch)
  i in 8..119 : name = f"Graft Codec {i} " + "zQ7#" * (i % 21)
                                               (lengths 16..96: the 17-32,
                                                33-64 and >64 branches)
  brand = f"Brand#{i % 45}"; hi = i - 60; lo = i * 2654435761

Usage: python3 tools/golden_codecs.py > /tmp/codec_values.sql
       (paste into CodecGolden.scala; regenerate when a law changes)
"""
import hashlib
import re

M64 = (1 << 64) - 1

# ---------------------------------------------------------------- farmhash
K0 = 0xC3A5C85C97CB3127
K1 = 0xB492B66FBE98F273
K2 = 0x9AE16A3B2F90404F


def _f64(b, i=0):
    return int.from_bytes(b[i:i + 8], "little")


def _f32(b, i=0):
    return int.from_bytes(b[i:i + 4], "little")


def _rot(v, s):
    return ((v >> s) | (v << (64 - s))) & M64


def _smix(v):
    return (v ^ (v >> 47)) & M64


def _h16(u, v, mul):
    a = ((u ^ v) * mul) & M64
    a ^= a >> 47
    b = ((v ^ a) * mul) & M64
    b ^= b >> 47
    return (b * mul) & M64


def _h0to16(b):
    n = len(b)
    if n >= 8:
        mul = (K2 + n * 2) & M64
        a = (_f64(b) + K2) & M64
        c = (_rot(_f64(b, n - 8), 37) * mul + a) & M64
        d = ((_rot(a, 25) + _f64(b, n - 8)) * mul) & M64
        return _h16(c, d, mul)
    if n >= 4:
        mul = (K2 + n * 2) & M64
        return _h16((n + (_f32(b) << 3)) & M64, _f32(b, n - 4), mul)
    if n > 0:
        y = (b[0] + (b[n >> 1] << 8)) & M64
        z = (n + (b[n - 1] << 2)) & M64
        return (_smix((y * K2 ^ z * K0) & M64) * K2) & M64
    return K2


def _h17to32(b):
    n = len(b)
    mul = (K2 + n * 2) & M64
    a = (_f64(b) * K1) & M64
    c = (_f64(b, n - 8) * mul) & M64
    d = (_f64(b, n - 16) * K2) & M64
    return _h16((_rot((a + _f64(b, 8)) & M64, 43) + _rot(c, 30) + d) & M64,
                (a + _rot((_f64(b, 8) + K2) & M64, 18) + c) & M64, mul)


def _h33to64(b):
    n = len(b)
    mul = (K2 + n * 2) & M64
    a = (_f64(b) * K2) & M64
    bb = _f64(b, 8)
    c = (_f64(b, n - 8) * mul) & M64
    d = (_f64(b, n - 16) * K2) & M64
    y = (_rot((a + bb) & M64, 43) + _rot(c, 30) + d) & M64
    z = _h16(y, (a + _rot((bb + K2) & M64, 18) + c) & M64, mul)
    e = (_f64(b, 16) * mul) & M64
    f = _f64(b, 24)
    g = ((y + _f64(b, n - 32)) * mul) & M64
    h = ((z + _f64(b, n - 24)) * mul) & M64
    return _h16((_rot((e + f) & M64, 43) + _rot(g, 30) + h) & M64,
                (e + _rot((f + a) & M64, 18) + g) & M64, mul)


def _weak(b, i, a, bseed):
    w = _f64(b, i)
    x = _f64(b, i + 8)
    y = _f64(b, i + 16)
    z = _f64(b, i + 24)
    a = (a + w) & M64
    bseed = _rot((bseed + a + z) & M64, 21)
    c = a
    a = (a + x + y) & M64
    bseed = (bseed + _rot(a, 44)) & M64
    return (a + z) & M64, (bseed + c) & M64


def farmhash64(b):
    n = len(b)
    if n <= 16:
        return _h0to16(b)
    if n <= 32:
        return _h17to32(b)
    if n <= 64:
        return _h33to64(b)
    seed = 81
    x = seed
    y = (seed * K1 + 113) & M64
    z = (_smix((y * K2 + 113) & M64) * K2) & M64
    v0 = v1 = w0 = w1 = 0
    x = (x * K2 + _f64(b)) & M64
    i = 0
    end = ((n - 1) // 64) * 64
    last = n - 64
    while True:
        x = (_rot((x + y + v0 + _f64(b, i + 8)) & M64, 37) * K1) & M64
        y = (_rot((y + v1 + _f64(b, i + 48)) & M64, 42) * K1) & M64
        x ^= w1
        y = (y + v0 + _f64(b, i + 40)) & M64
        z = (_rot((z + w0) & M64, 33) * K1) & M64
        v0, v1 = _weak(b, i, (v1 * K1) & M64, (x + w0) & M64)
        w0, w1 = _weak(b, i + 32, (z + w1) & M64, (y + _f64(b, i + 16)) & M64)
        z, x = x, z
        i += 64
        if i == end:
            break
    mul = (K1 + ((z & 0xFF) << 1)) & M64
    i = last
    w0 = (w0 + ((n - 1) & 63)) & M64
    v0 = (v0 + w0) & M64
    w0 = (w0 + v0) & M64
    x = (_rot((x + y + v0 + _f64(b, i + 8)) & M64, 37) * mul) & M64
    y = (_rot((y + v1 + _f64(b, i + 48)) & M64, 42) * mul) & M64
    x ^= (w1 * 9) & M64
    y = (y + v0 * 9 + _f64(b, i + 40)) & M64
    z = (_rot((z + w0) & M64, 33) * mul) & M64
    v0, v1 = _weak(b, i, (v1 * mul) & M64, (x + w0) & M64)
    w0, w1 = _weak(b, i + 32, (z + w1) & M64, (y + _f64(b, i + 16)) & M64)
    z, x = x, z
    return _h16((_h16(v0, w0, mul) + _smix(y) * K0 + z) & M64,
                (_h16(v1, w1, mul) + x) & M64, mul)


# ----------------------------------------------------------------- others
def fnv64a(b):
    h = 0xCBF29CE484222325
    for c in b:
        h = ((h ^ c) * 0x100000001B3) & M64
    return h


def crc16_xmodem(b):
    crc = 0
    for byte in b:
        crc ^= byte << 8
        for _ in range(8):
            crc = ((crc << 1) ^ 0x1021 if crc & 0x8000 else crc << 1) & 0xFFFF
    return crc


B32 = "ABCDEFGHIJKLMNOPQRSTUVWXYZ234567"


def base32_nopad(data):
    out, buf, bits = [], 0, 0
    for byte in data:
        buf = (buf << 8) | byte
        bits += 8
        while bits >= 5:
            out.append(B32[(buf >> (bits - 5)) & 0x1F])
            bits -= 5
    if bits:
        out.append(B32[(buf << (5 - bits)) & 0x1F])
    return "".join(out)


def strkey_account(payload32):
    body = bytes([6 << 3]) + payload32
    crc = crc16_xmodem(body)
    return base32_nopad(body + bytes([crc & 0xFF, (crc >> 8) & 0xFF]))


def signed64(v):
    v &= M64
    return v - (1 << 64) if v >= (1 << 63) else v


def int128_string(hi, lo):
    return str((hi << 64) + (lo & M64))


def rolling_hash(text):
    norm = re.sub(r"\s+", " ", text.lower()).strip()
    acc = 0
    for ch in norm:
        acc = (acc * 31 + ord(ch)) & M64
    return signed64(acc)


SUBWORD_RE = re.compile(
    r"(?=[A-Z])|[\s]+|(?<=[a-z])(?=[0-9])|(?=[^A-Za-z0-9\s])")


def n_subwords(text):
    return sum(1 for t in SUBWORD_RE.split(text) if t != "")


# ---------------------------------------------------------------- fixture
def name_of(i):
    if i < 8:
        return "zQ7#xY9w"[:i]
    return f"Graft Codec {i} " + "zQ7#" * (i % 21)


def main():
    rows = []
    for i in range(120):
        name = name_of(i)
        nb = name.encode("utf-8")
        brand = f"Brand#{i % 45}"
        hi, lo = i - 60, i * 2654435761
        sha = hashlib.sha256(nb).digest()
        rows.append((
            i,
            signed64(farmhash64(nb)),
            signed64(fnv64a(nb)),
            signed64(farmhash64((brand + name + "credit_alphanum4")
                                .encode("utf-8"))),
            strkey_account(sha),
            int128_string(hi, lo),
            rolling_hash(name),
            n_subwords(name),
        ))
    print("SELECT * FROM (VALUES")
    print(",\n".join(
        f"  ({i}::BIGINT, {fh}::BIGINT, {fn}::BIGINT, {aid}::BIGINT, "
        f"'{sk}', '{i128}', {rh}::BIGINT, {ns}::BIGINT)"
        for i, fh, fn, aid, sk, i128, rh, ns in rows))
    print(") AS t(id, farmhash64, fnv64a, asset_id, strkey_like, i128, "
          "rolling_hash, n_subwords)")
    print("-- ORDER BY id")


if __name__ == "__main__":
    main()
