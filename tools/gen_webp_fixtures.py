#!/usr/bin/env python3
"""Generate lossless-WebP (VP8L) golden fixtures for Vp8lSpec by calling
the system libwebp through ctypes (no PIL/cwebp on this box). For each
deterministic pixel pattern we emit <name>.webp plus <name>.rgba (the raw
RGBA bytes, row-major) under src/test/resources/webp/. The Scala decoder
must reproduce the .rgba bytes exactly. Dev tooling only — run once,
commit the outputs.

Patterns are chosen to push the encoder through the format's features:
palette (color indexing + pixel packing), gradients (predictor transform
+ subtract-green), repetitive tiles (LZ77 + color cache), LCG noise
(plain literals), odd sizes (block-boundary edges).
"""
import ctypes, os, sys

lib = ctypes.CDLL("libwebp.so.7")
lib.WebPEncodeLosslessRGBA.restype = ctypes.c_size_t
lib.WebPEncodeLosslessRGBA.argtypes = [
    ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
    ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8))]
lib.WebPFree.argtypes = [ctypes.c_void_p]

OUT = os.path.join(os.path.dirname(__file__), "..", "src", "test", "resources", "webp")
os.makedirs(OUT, exist_ok=True)


def encode(name, w, h, rgba):
    assert len(rgba) == w * h * 4, (name, w, h, len(rgba))
    buf = ctypes.create_string_buffer(bytes(rgba), len(rgba))
    out = ctypes.POINTER(ctypes.c_uint8)()
    n = lib.WebPEncodeLosslessRGBA(buf, w, h, w * 4, ctypes.byref(out))
    assert n > 0, f"encode failed for {name}"
    data = ctypes.string_at(out, n)
    lib.WebPFree(out)
    with open(os.path.join(OUT, f"{name}.webp"), "wb") as f:
        f.write(data)
    with open(os.path.join(OUT, f"{name}.rgba"), "wb") as f:
        f.write(bytes(rgba))
    with open(os.path.join(OUT, f"{name}.dims"), "w") as f:
        f.write(f"{w} {h}\n")
    print(f"{name}: {w}x{h} -> {n} bytes webp")


def lcg(seed):
    s = seed
    while True:
        s = (s * 6364136223846793005 + 1442695040888963407) & (2**64 - 1)
        yield (s >> 33) & 0xFF


def solid(w, h, r, g, b, a):
    return bytes([r, g, b, a]) * (w * h)


def gradient(w, h):
    px = bytearray()
    for y in range(h):
        for x in range(w):
            px += bytes([(x * 255) // max(1, w - 1), (y * 255) // max(1, h - 1),
                         ((x + y) * 255) // max(1, w + h - 2), 255])
    return px


def palette(w, h):
    colors = [(255, 0, 0, 255), (0, 255, 0, 255), (0, 0, 255, 128), (10, 20, 30, 255)]
    px = bytearray()
    for y in range(h):
        for x in range(w):
            px += bytes(colors[(x // 3 + y // 2) % 4])
    return px


def noise(w, h, seed):
    # alpha stays in [128, 255]: libwebp's default (non-exact) lossless
    # mode zeroes RGB under fully-transparent pixels, which would make
    # the golden RGBA unreachable for alpha = 0 noise
    g = lcg(seed)
    px = bytearray()
    for _ in range(w * h):
        px += bytes([next(g), next(g), next(g), 128 + next(g) % 128])
    return px


def tiles(w, h):
    # repetitive 8x8 tiles with a small color set: LZ77 + color cache bait
    base = [(i * 37 % 256, i * 59 % 256, i * 83 % 256, 255) for i in range(7)]
    px = bytearray()
    for y in range(h):
        for x in range(w):
            px += bytes(base[((x % 8) * 3 + (y % 8) * 5) % 7])
    return px


def photoish(w, h):
    # smooth base + fine texture: predictors + meta-huffman bait
    g = lcg(99)
    px = bytearray()
    for y in range(h):
        for x in range(w):
            r = (x * x // 97 + y * 3) % 256
            gr = (x + y * y // 113) % 256
            b = (x * y // 51) % 256
            t = next(g) % 9
            px += bytes([(r + t) % 256, (gr + t) % 256, (b + t) % 256, 255])
    return px


encode("solid16", 16, 16, solid(16, 16, 200, 100, 50, 255))
encode("alpha8", 8, 8, solid(8, 8, 10, 250, 60, 77))
encode("grad64", 64, 64, gradient(64, 64))
encode("pal33", 33, 33, palette(33, 33))
encode("noise128", 128, 96, noise(128, 96, 42))
encode("tiles80", 80, 72, tiles(80, 72))
encode("photo256", 256, 200, photoish(256, 200))
encode("one1", 1, 1, solid(1, 1, 1, 2, 3, 4))
encode("tiny3x2", 3, 2, gradient(3, 2))
encode("wide301", 301, 7, gradient(301, 7))
print("OK")
