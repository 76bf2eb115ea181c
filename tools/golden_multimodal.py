#!/usr/bin/env python3
"""Independent golden for `x_multimodal_pipeline` (operators/Multimodal.scala).

Replays, WITHOUT touching the engine or any image/audio library, the
planted-media laws of `operators/MultimodalFixtures.scala` and the documented
codec laws:

  pixel law     r=(x*7+y*13+i*31)%256  g=(x*11+y*3+i*17)%256  b=(x*5+y*19+i*41)%256
                over w=16+(i%7)*8, h=16+(i%5)*8   (pattern PNGs are lossless)
  sample law    s(i,f,c) = ((i*31+f*7+c*13) % 2001) - 1000 over
                frames=1000+i*10, channels=1+(i%2) (16-bit PCM, lossless)
  pipeline law  i%5 in {0,1,2} -> pattern PNG (decode->resize->features);
                3 -> WAV (decode->audio features); 4 -> unrecognized bytes
                (dropped at the decode gate)
  resize law    exact nearest neighbor to 64x64: src=(x*w//64, y*h//64)
  feature law   images: 4x4 grid over the resized image, cell = sum(r+g+b);
                audio: 16 time windows, frame f -> window f*16//frames,
                window += sample^2 per channel (exact Longs);
                embedding = cell / l2norm as float32
  ANN law       Similarity.bruteForceTopKExact: qv=round_half_up(f32*10000),
                n2=sum(cv^2), dot=sum(qv*cv), key=sign(dot)*dot^2/n2 (f64),
                rank by key desc then neighbor_id asc, self excluded, k=3,
                queries = surviving media_id < 7

The engine path runs REAL javax.imageio / javax.sound.sampled decode work;
a hash match therefore proves the JDK codecs reproduced the planted media
exactly. Prints the VALUES block for MultimodalGolden.pipelineOracleSql.
"""
import numpy as np

N, TARGET, GRID, K, QMAX = 40, 64, 4, 3, 7


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
    norm = np.sqrt(float(sum(s * s for s in sums)))
    return [np.float32(s / norm) for s in sums]


def audio_embedding(i):
    frames, channels, dim = 1000 + i * 10, 1 + (i % 2), GRID * GRID
    sums = [0] * dim
    for f in range(frames):
        w = f * dim // frames
        for c in range(channels):
            s = ((i * 31 + f * 7 + c * 13) % 2001) - 1000
            sums[w] += s * s
    norm = np.sqrt(float(sum(s * s for s in sums)))
    return [np.float32(s / norm) for s in sums]


def quant(emb):
    # floor(v*10000+0.5) replays Spark's HALF_UP round ONLY for v >= 0
    # (floor(-1.5+0.5) = -1, HALF_UP = -2); the grid-luminance and PCM-energy
    # feature laws are non-negative by construction — fail loudly if a
    # future signed feature law lands here instead of diverging silently.
    assert all(v >= 0 for v in emb), "quant() requires non-negative features"
    return [int(np.floor(np.float64(v) * 10000 + 0.5)) for v in emb]


survivors = [i for i in range(N) if i % 5 in (0, 1, 2, 3)]
vecs = {i: quant(audio_embedding(i) if i % 5 == 3 else image_embedding(i))
        for i in survivors}
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

print("VALUES block for MultimodalGolden.pipelineOracleSql:")
for j, (q, c, rank, dot, n2) in enumerate(rows):
    sep = "," if j < len(rows) - 1 else ""
    print(f"  ({q}::BIGINT, {c}::BIGINT, {rank}::INT, {dot}::BIGINT, {n2}::BIGINT){sep}")
