#!/usr/bin/env python3
"""Independent golden for `x_multimodal_pipeline_v2` (all three modalities).

Extends tools/golden_multimodal.py with the GIF-as-video leg. Replays,
WITHOUT the engine or any media library, the planted laws of
`operators/MultimodalFixtures.scala`:

  pipeline-v2 law  i%6 in {0,1} -> pattern PNG (decode->resize->features);
                   2 -> indexed-GIF video (frame-sampled grid features);
                   3 -> WAV (audio features); 4 -> unrecognized bytes and
                   5 -> truncated PNG (both dropped at the decode gate)
  image law        as v1: pixel law, exact NN resize to 64x64, 4x4 grid
  video law        palette[p] = ((p*7+i*31)%256, (p*11+i*17)%256, (p*5+i*41)%256)
                   idx(x,y,f) = (x*3+y*5+f*29+i*13)%256 over
                   w=16+(i%4)*8, h=16+(i%3)*8, frames=3+(i%3);
                   sampled frames 0,2,4,... (stride 2), 4x4 grid over the
                   NATIVE frame (cy=y*4//h, cx=x*4//w), cell += r+g+b,
                   summed across sampled frames (exact ints, no resize)
  audio law        as v1: 16 windows of sum(sample^2)
  ANN law          as v1 (quantize 1e4 HALF_UP, exact dot/n2, k=3,
                   queries = surviving media_id < 8)

Prints the VALUES block for MultimodalGolden.pipelineV2OracleSql.
"""
import numpy as np

N, TARGET, GRID, K, QMAX = 42, 64, 4, 3, 8


def image_embedding(i):
    w, h = 16 + (i % 7) * 8, 16 + (i % 5) * 8
    sums = [0] * (GRID * GRID)
    for y in range(TARGET):
        sy = y * h // TARGET
        for x in range(TARGET):
            sx = x * w // TARGET
            r = (sx * 7 + sy * 13 + i * 31) % 256
            g = (sx * 11 + sy * 3 + i * 17) % 256
            b = (sx * 5 + sy * 19 + i * 41) % 256
            sums[(y * GRID // TARGET) * GRID + (x * GRID // TARGET)] += r + g + b
    return sums


def video_embedding(i):
    w, h = 16 + (i % 4) * 8, 16 + (i % 3) * 8
    frames = 3 + (i % 3)
    pal = [((p * 7 + i * 31) % 256) + ((p * 11 + i * 17) % 256)
           + ((p * 5 + i * 41) % 256) for p in range(256)]
    sums = [0] * (GRID * GRID)
    for f in range(0, frames, 2):
        for y in range(h):
            cy = y * GRID // h
            for x in range(w):
                idx = (x * 3 + y * 5 + f * 29 + i * 13) % 256
                sums[cy * GRID + x * GRID // w] += pal[idx]
    return sums


def audio_embedding(i):
    frames, channels, dim = 1000 + i * 10, 1 + (i % 2), GRID * GRID
    sums = [0] * dim
    for f in range(frames):
        w = f * dim // frames
        for c in range(channels):
            s = ((i * 31 + f * 7 + c * 13) % 2001) - 1000
            sums[w] += s * s
    return sums


def quant(sums):
    norm = np.sqrt(float(sum(s * s for s in sums)))
    emb = [np.float32(s / norm) for s in sums]
    assert all(v >= 0 for v in emb), "quant() requires non-negative features"
    return [int(np.floor(np.float64(v) * 10000 + 0.5)) for v in emb]


LEG = {0: image_embedding, 1: image_embedding,
       2: video_embedding, 3: audio_embedding}
survivors = [i for i in range(N) if i % 6 in LEG]
vecs = {i: quant(LEG[i % 6](i)) for i in survivors}
rows = []
for q in [i for i in survivors if i < QMAX]:
    qv = vecs[q]
    scored = []
    for c in survivors:
        if c == q:
            continue
        cv = vecs[c]
        n2 = sum(x * x for x in cv)
        dot = sum(a * b for a, b in zip(qv, cv))
        key = -np.inf if n2 == 0 else np.float64(dot) * dot / n2 * (1 if dot >= 0 else -1)
        scored.append((key, c, dot, n2))
    scored.sort(key=lambda t: (-t[0], t[1]))
    for rank, (_, c, dot, n2) in enumerate(scored[:K], 1):
        rows.append((q, c, rank, dot, n2))

print("VALUES block for MultimodalGolden.pipelineV2OracleSql:")
for j, (q, c, rank, dot, n2) in enumerate(rows):
    sep = "," if j < len(rows) - 1 else ""
    print(f"  ({q}::BIGINT, {c}::BIGINT, {rank}::INT, {dot}::BIGINT, {n2}::BIGINT){sep}")
