#!/usr/bin/env python3
"""Validate graft's VP8L ENCODER against the system libwebp DECODER:
for each <name>.webp written by `sbt "Test/runMain
graft.images.Vp8lEncodeDump <dir>"`, decode with WebPDecodeRGBA and
compare against <name>.rgba byte-for-byte. Dev tooling only (zero
test-time dependency); proves the streams are valid WebP to the
reference implementation, not merely to our own decoder.

Usage: python3 tools/check_webp_encoder.py [dir=/tmp/vp8l_enc]
"""
import ctypes, os, sys

lib = ctypes.CDLL("libwebp.so.7")
lib.WebPDecodeRGBA.restype = ctypes.POINTER(ctypes.c_uint8)
lib.WebPDecodeRGBA.argtypes = [ctypes.c_char_p, ctypes.c_size_t,
                               ctypes.POINTER(ctypes.c_int),
                               ctypes.POINTER(ctypes.c_int)]
lib.WebPFree.argtypes = [ctypes.c_void_p]

d = sys.argv[1] if len(sys.argv) > 1 else "/tmp/vp8l_enc"
fails = 0
for f in sorted(os.listdir(d)):
    if not f.endswith(".webp"):
        continue
    name = f[:-5]
    data = open(os.path.join(d, f), "rb").read()
    golden = open(os.path.join(d, f"{name}.rgba"), "rb").read()
    w0, h0 = map(int, open(os.path.join(d, f"{name}.dims")).read().split())
    w, h = ctypes.c_int(), ctypes.c_int()
    out = lib.WebPDecodeRGBA(data, len(data), ctypes.byref(w), ctypes.byref(h))
    if not out:
        print(f"{name}: libwebp REFUSED the stream"); fails += 1; continue
    got = ctypes.string_at(out, w.value * h.value * 4)
    lib.WebPFree(out)
    if (w.value, h.value) != (w0, h0):
        print(f"{name}: dims {w.value}x{h.value} != {w0}x{h0}"); fails += 1
    elif got != golden:
        i = next(i for i in range(len(golden)) if golden[i] != got[i])
        print(f"{name}: pixel byte {i}: {got[i]} != {golden[i]}"); fails += 1
    else:
        print(f"{name}: OK ({len(data)} bytes)")
sys.exit(1 if fails else 0)
