#!/usr/bin/env python3
"""Generate FLAC fixtures from the public format spec (RFC 9639).

Pure-Python reference ENCODER, written independently of the Scala decoder
(graft/multimodal/FlacDecode.scala): the encoder follows the spec's bit
layout; the decoder must reproduce the exact input PCM, and additionally
re-verify the format's own integrity chain (CRC-8 frame headers, CRC-16
frames, STREAMINFO MD5 of the unencoded PCM - the `flac -t` contract).
No system flac binary exists in this container, so cross-validation is
spec-vs-spec plus the in-format checksums.

Outputs:
  src/main/resources/flac/<name>.flac        fixture streams
  src/test/resources/flac_pcm/<name>.pcm     int32-LE interleaved ground truth
  (stdout)                                   oracle literals for q204

Coverage matrix: constant / verbatim / fixed(0-4) / LPC subframes, rice
partition orders 0-3, RICE2, escape partitions (incl. 0-bit), wasted
bits, independent + left/side + right/side + mid/side stereo, 8/16/24
bps, fixed-code and explicit block sizes, short tail frame.
"""
import hashlib
import os
import struct

ROOT = os.path.join(os.path.dirname(__file__), "..")
FLAC_DIR = os.path.join(ROOT, "src/main/resources/flac")
PCM_DIR = os.path.join(ROOT, "src/test/resources/flac_pcm")


class BitWriter:
    def __init__(self):
        self.bytes = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value, bits):
        assert bits >= 0
        if bits == 0:
            return
        value &= (1 << bits) - 1
        self.acc = (self.acc << bits) | value
        self.nbits += bits
        while self.nbits >= 8:
            self.nbits -= 8
            self.bytes.append((self.acc >> self.nbits) & 0xFF)
        self.acc &= (1 << self.nbits) - 1

    def write_signed(self, value, bits):
        self.write(value & ((1 << bits) - 1), bits)

    def write_unary(self, q):
        # FLAC unary: q zero bits then a one bit
        while q >= 32:
            self.write(0, 32)
            q -= 32
        self.write(1, q + 1)

    def align(self):
        if self.nbits:
            self.write(0, 8 - self.nbits)


def crc8(data):
    # poly x^8 + x^2 + x + 1 (0x07), init 0, MSB-first
    crc = 0
    for b in data:
        crc ^= b
        for _ in range(8):
            crc = ((crc << 1) ^ 0x07) & 0xFF if crc & 0x80 else (crc << 1) & 0xFF
    return crc


def crc16(data):
    # poly 0x8005, init 0, MSB-first
    crc = 0
    for b in data:
        crc ^= b << 8
        for _ in range(8):
            crc = ((crc << 1) ^ 0x8005) & 0xFFFF if crc & 0x8000 else (crc << 1) & 0xFFFF
    return crc


def utf8_coded(n):
    # FLAC's UTF-8-style coded number (frame index)
    if n < 0x80:
        return bytes([n])
    out = []
    bits = n.bit_length()
    nbytes = 2
    while bits > 6 + 5 * (nbytes - 1) - (nbytes - 2):
        # capacity of k-byte form: (7 - k) + 6*(k-1) bits
        cap = (7 - nbytes) + 6 * (nbytes - 1)
        if bits <= cap:
            break
        nbytes += 1
    cap_head = 7 - nbytes
    head = (0xFF << (cap_head + 1)) & 0xFF | ((n >> (6 * (nbytes - 1))) & ((1 << cap_head) - 1))
    out.append(head)
    for i in range(nbytes - 2, -1, -1):
        out.append(0x80 | ((n >> (6 * i)) & 0x3F))
    return bytes(out)


FIXED_COEFS = {
    0: [],
    1: [1],
    2: [2, -1],
    3: [3, -3, 1],
    4: [4, -6, 4, -1],
}


def fixed_residual(x, order):
    coefs = FIXED_COEFS[order]
    return [x[i] - sum(c * x[i - 1 - j] for j, c in enumerate(coefs))
            for i in range(order, len(x))]


def lpc_residual(x, order, coefs, shift):
    return [x[i] - (sum(c * x[i - 1 - j] for j, c in enumerate(coefs)) >> shift)
            for i in range(order, len(x))]


def zigzag(r):
    return (r << 1) if r >= 0 else ((-r << 1) - 1)


def write_residual(bw, res, n, pred_order, part_order, method, params):
    """method: 0 = RICE (4-bit), 1 = RICE2 (5-bit). params: per-partition
    rice parameter, or ('esc', bits) for an escape partition."""
    pbits = 4 if method == 0 else 5
    esc = (1 << pbits) - 1
    bw.write(method, 2)
    bw.write(part_order, 4)
    nparts = 1 << part_order
    assert n % nparts == 0
    idx = 0
    for p in range(nparts):
        cnt = (n >> part_order) - (pred_order if p == 0 else 0)
        spec = params[p]
        if isinstance(spec, tuple) and spec[0] == "esc":
            bw.write(esc, pbits)
            raw = spec[1]
            bw.write(raw, 5)
            for _ in range(cnt):
                if raw > 0:
                    bw.write_signed(res[idx], raw)
                else:
                    assert res[idx] == 0
                idx += 1
        else:
            assert spec != esc
            bw.write(spec, pbits)
            for _ in range(cnt):
                u = zigzag(res[idx])
                bw.write_unary(u >> spec)
                bw.write(u & ((1 << spec) - 1), spec)
                idx += 1
    assert idx == len(res)


def min_raw_bits(vals):
    m = 1
    for v in vals:
        m = max(m, v.bit_length() + 1)
    return m


def auto_params(res, n, pred_order, part_order, method):
    """Pick a workable rice parameter per partition (not optimal - the
    decoder doesn't care)."""
    pbits = 4 if method == 0 else 5
    esc = (1 << pbits) - 1
    nparts = 1 << part_order
    out = []
    idx = 0
    for p in range(nparts):
        cnt = (n >> part_order) - (pred_order if p == 0 else 0)
        part = res[idx:idx + cnt]
        idx += cnt
        if not part:
            out.append(0)
            continue
        mean = sum(zigzag(r) for r in part) / max(1, len(part))
        k = 0
        while (1 << (k + 1)) < mean + 1 and k < esc - 1:
            k += 1
        out.append(k)
    return out


def write_subframe(bw, x, bps, plan):
    """plan: ('const',) | ('verbatim',) | ('fixed', order, part_order,
    method, params|None) | ('lpc', order, coefs, shift, precision,
    part_order, method, params|None) | ('wasted', inner_plan, w)"""
    kind = plan[0]
    wasted = 0
    if kind == "wasted":
        wasted = plan[2]
        assert all((v & ((1 << wasted) - 1)) == 0 for v in x)
        x = [v >> wasted for v in x]
        plan = plan[1]
        kind = plan[0]
    ebps = bps - wasted
    bw.write(0, 1)  # pad
    if kind == "const":
        assert all(v == x[0] for v in x)
        bw.write(0, 6)
    elif kind == "verbatim":
        bw.write(1, 6)
    elif kind == "fixed":
        bw.write(0b001000 | plan[1], 6)
    else:
        bw.write(0b100000 | (plan[1] - 1), 6)
    if wasted:
        bw.write(0, 1 - 1)  # nothing; flag handled below
    # wasted-bits flag + unary(wasted - 1)
    if wasted:
        bw.write(1, 1)
        bw.write_unary(wasted - 1)
    else:
        bw.write(0, 1)
    n = len(x)
    if kind == "const":
        bw.write_signed(x[0], ebps)
    elif kind == "verbatim":
        for v in x:
            bw.write_signed(v, ebps)
    elif kind == "fixed":
        _, order, part_order, method, params = plan
        for v in x[:order]:
            bw.write_signed(v, ebps)
        res = fixed_residual(x, order)
        if params is None:
            params = auto_params(res, n, order, part_order, method)
        write_residual(bw, res, n, order, part_order, method, params)
    else:
        _, order, coefs, shift, precision, part_order, method, params = plan
        for v in x[:order]:
            bw.write_signed(v, ebps)
        bw.write(precision - 1, 4)
        bw.write_signed(shift, 5)
        for c in coefs:
            assert -(1 << (precision - 1)) <= c < (1 << (precision - 1))
            bw.write_signed(c, precision)
        res = lpc_residual(x, order, coefs, shift)
        if params is None:
            params = auto_params(res, n, order, part_order, method)
        write_residual(bw, res, n, order, part_order, method, params)


BLOCKSIZE_CODES = {192: 0b0001, 576: 0b0010, 1152: 0b0011, 2304: 0b0100,
                   4608: 0b0101, 256: 0b1000, 512: 0b1001, 1024: 0b1010,
                   2048: 0b1011, 4096: 0b1100}
SAMPLESIZE_CODES = {8: 0b001, 12: 0b010, 16: 0b100, 20: 0b101, 24: 0b110}


def encode_frame(frame_idx, chans, bps, blocksize, mode, plans,
                 force_explicit_bs=False):
    """chans: list of per-channel sample lists (original L/R...).
    mode: 'indep' | 'ls' | 'rs' | 'ms'. plans: per coded channel."""
    bw = BitWriter()
    bw.write(0b11111111111110, 14)
    bw.write(0, 1)
    bw.write(0, 1)  # fixed-blocksize strategy
    if not force_explicit_bs and blocksize in BLOCKSIZE_CODES:
        bs_code, bs_tail = BLOCKSIZE_CODES[blocksize], None
    elif blocksize <= 256:
        bs_code, bs_tail = 0b0110, ("u8", blocksize - 1)
    else:
        bs_code, bs_tail = 0b0111, ("u16", blocksize - 1)
    bw.write(bs_code, 4)
    bw.write(0, 4)  # sample rate: from STREAMINFO
    nch = len(chans)
    if mode == "indep":
        bw.write(nch - 1, 4)
        coded = chans
        extra = [0] * nch
    elif mode == "ls":
        assert nch == 2
        bw.write(0b1000, 4)
        side = [l - r for l, r in zip(chans[0], chans[1])]
        coded = [chans[0], side]
        extra = [0, 1]
    elif mode == "rs":
        assert nch == 2
        bw.write(0b1001, 4)
        side = [l - r for l, r in zip(chans[0], chans[1])]
        coded = [side, chans[1]]
        extra = [1, 0]
    else:
        assert nch == 2
        bw.write(0b1010, 4)
        mid = [(l + r) >> 1 for l, r in zip(chans[0], chans[1])]
        side = [l - r for l, r in zip(chans[0], chans[1])]
        coded = [mid, side]
        extra = [0, 1]
    bw.write(SAMPLESIZE_CODES[bps], 3)
    bw.write(0, 1)
    for b in utf8_coded(frame_idx):
        bw.write(b, 8)
    if bs_tail is not None:
        bw.write(bs_tail[1], 8 if bs_tail[0] == "u8" else 16)
    bw.write(crc8(bytes(bw.bytes)), 8)
    assert bw.nbits == 0
    for ch, plan in enumerate(plans):
        write_subframe(bw, coded[ch], bps + extra[ch], plan)
    bw.align()
    bw.write(crc16(bytes(bw.bytes)), 16)
    return bytes(bw.bytes)


def streaminfo(min_bs, max_bs, sr, nch, bps, total, md5):
    bw = BitWriter()
    bw.write(min_bs, 16)
    bw.write(max_bs, 16)
    bw.write(0, 24)  # min frame size unknown
    bw.write(0, 24)  # max frame size unknown
    bw.write(sr, 20)
    bw.write(nch - 1, 3)
    bw.write(bps - 1, 5)
    bw.write(total, 36)
    body = bytes(bw.bytes) + md5
    assert len(body) == 34
    return b"\x80" + struct.pack(">I", 34)[1:] + body  # last-block flag set


def pcm_md5(chans, bps):
    """MD5 of the unencoded PCM: interleaved, little-endian,
    ceil(bps/8) bytes per sample (spec 9639 sec 8.2)."""
    nb = (bps + 7) // 8
    h = hashlib.md5()
    n = len(chans[0])
    buf = bytearray()
    for i in range(n):
        for ch in chans:
            v = ch[i] & ((1 << (8 * nb)) - 1)
            for k in range(nb):
                buf.append((v >> (8 * k)) & 0xFF)
    h.update(bytes(buf))
    return h.digest()


def build(name, sr, bps, chans_frames, modes, plans_per_frame, blocksizes,
          force_explicit_bs=False):
    """chans_frames: list of frames, each a list of per-channel sample
    lists."""
    nch = len(chans_frames[0])
    full = [[] for _ in range(nch)]
    for fr in chans_frames:
        for c in range(nch):
            full[c].extend(fr[c])
    total = len(full[0])
    md5 = pcm_md5(full, bps)
    bss = [len(fr[0]) for fr in chans_frames]
    data = b"fLaC" + streaminfo(min(bss), max(bss), sr, nch, bps, total, md5)
    for i, fr in enumerate(chans_frames):
        data += encode_frame(i, fr, bps, len(fr[0]), modes[i],
                             plans_per_frame[i],
                             force_explicit_bs=force_explicit_bs)
    with open(os.path.join(FLAC_DIR, name + ".flac"), "wb") as f:
        f.write(data)
    with open(os.path.join(PCM_DIR, name + ".pcm"), "wb") as f:
        n = len(full[0])
        out = bytearray()
        for i in range(n):
            for c in range(nch):
                out += struct.pack("<i", full[c][i])
        f.write(bytes(out))
    return full, total


def lcg(seed):
    s = seed
    while True:
        s = (s * 6364136223846793005 + 1442695040888963407) & ((1 << 64) - 1)
        yield s >> 33


def sig(seed, n, amp):
    g = lcg(seed)
    out = []
    acc = 0
    for _ in range(n):
        acc = (acc * 3) // 4 + (next(g) % (2 * amp + 1)) - amp
        out.append(max(-amp, min(amp, acc)))
    return out


def fnv(vals):
    h = 0xCBF29CE484222325
    for v in vals:
        h = ((h ^ (v & 0xFFFFFFFFFFFFFFFF)) * 0x100000001B3) & ((1 << 64) - 1)
    return h - (1 << 64) if h >= (1 << 63) else h


def main():
    os.makedirs(FLAC_DIR, exist_ok=True)
    os.makedirs(PCM_DIR, exist_ok=True)
    oracle = []

    # 1. constant + fixed orders, blocksize 192 (fixed code), 16-bit mono
    frames = [[[1234] * 192], [sig(1, 192, 9000)], [sig(2, 192, 9000)],
              [sig(3, 192, 9000)], [sig(4, 192, 9000)], [sig(5, 192, 9000)]]
    build("fixed_orders", 8000, 16, frames,
          ["indep"] * 6,
          [[("const",)], [("fixed", 0, 0, 0, None)], [("fixed", 1, 1, 0, None)],
           [("fixed", 2, 2, 0, None)], [("fixed", 3, 3, 0, None)],
           [("fixed", 4, 0, 1, None)]],  # last: RICE2
          [192] * 6)

    # 2. verbatim, 8-bit mono, explicit 8-bit blocksize header
    frames = [[sig(6, 100, 120)]]
    build("verbatim8", 8000, 8, frames, ["indep"], [[("verbatim",)]], [100],
          force_explicit_bs=True)

    # 3. LPC orders 1/8/12, partition orders 0-2, 16-bit mono, bs 256
    c8 = [120, -60, 30, -15, 8, -4, 2, -1]
    c12 = [200, -100, 50, -25, 12, -6, 3, -2, 1, -1, 1, -1]
    frames = [[sig(7, 256, 12000)], [sig(8, 256, 12000)], [sig(9, 256, 12000)]]
    build("lpc_orders", 16000, 16, frames, ["indep"] * 3,
          [[("lpc", 1, [100], 7, 8, 0, 0, None)],
           [("lpc", 8, c8, 7, 9, 1, 0, None)],
           [("lpc", 12, c12, 8, 10, 2, 0, None)]],
          [256] * 3)

    # 4. stereo modes, 16-bit, bs 192
    def st(seedl, seedr):
        return [sig(seedl, 192, 9000), sig(seedr, 192, 9000)]
    frames = [st(10, 11), st(12, 13), st(14, 15), st(16, 17)]
    build("stereo_modes", 44100, 16, frames, ["indep", "ls", "rs", "ms"],
          [[("fixed", 2, 0, 0, None), ("fixed", 2, 0, 0, None)],
           [("fixed", 1, 1, 0, None), ("fixed", 2, 1, 0, None)],
           [("fixed", 2, 0, 0, None), ("fixed", 1, 0, 0, None)],
           [("fixed", 2, 2, 0, None), ("fixed", 2, 2, 0, None)]],
          [192] * 4)

    # 5. 24-bit mid/side LPC, explicit 16-bit blocksize (300)
    frames = [[sig(18, 300, 4000000), sig(19, 300, 4000000)]]
    build("bits24_ms", 48000, 24, frames, ["ms"],
          [[("lpc", 4, [150, -70, 30, -10], 7, 9, 0, 1, None),
            ("fixed", 3, 0, 1, None)]],
          [300], force_explicit_bs=True)

    # 6. wasted bits: all samples multiples of 8 (3 wasted), fixed order 1
    base = [v * 8 for v in sig(20, 192, 1000)]
    build("wasted_bits", 8000, 16, [[base]], ["indep"],
          [[("wasted", ("fixed", 1, 0, 0, None), 3)]], [192])

    # 7. escape partitions: order-3 partitions, two escaped (one 0-bit)
    x = sig(21, 256, 9000)
    # zero a partition's residual region by making it constant there:
    # with fixed order 0 residual == x, so set partition 2 (samples
    # 64..95) to zeros for the 0-bit escape
    for i in range(64, 96):
        x[i] = 0
    res = x[:]  # order 0
    params = auto_params(res, 256, 0, 3, 0)
    params[2] = ("esc", 0)
    params[5] = ("esc", min_raw_bits(res[160:192]))
    build("escape_parts", 8000, 16, [[x]], ["indep"],
          [[("fixed", 0, 3, 0, params)]], [256])

    # 8. short tail frame: 576 + 576 + 123
    frames = [[sig(22, 576, 9000)], [sig(23, 576, 9000)], [sig(24, 123, 9000)]]
    build("short_tail", 22050, 16, frames, ["indep"] * 3,
          [[("fixed", 2, 0, 0, None)], [("fixed", 2, 3, 0, None)],
           [("fixed", 1, 0, 0, None)]],
          [576, 576, 123])

    # 9. q204 fixture: 16-bit stereo, 22050 Hz, 4410 samples -> 200 ms
    nfr, bs = 4410 // 441, 441  # 10 frames of 441
    fl = sig(25, 4410, 14000)
    fr_ = sig(26, 4410, 14000)
    frames = [[fl[i * bs:(i + 1) * bs], fr_[i * bs:(i + 1) * bs]]
              for i in range(nfr)]
    modes = ["indep", "ls", "rs", "ms"] * 3
    plans = []
    for i in range(nfr):
        # blocksize 441 is odd -> partition order 0 only
        p = ("fixed", i % 5, 0, i % 2, None)
        plans.append([p, p])
    full, total = build("tune_n", 22050, 16, frames, modes[:nfr], plans,
                        [bs] * nfr)
    inter = []
    for i in range(total):
        inter.append(full[0][i])
        inter.append(full[1][i])
    oracle.append(("tune_n.flac", 22050, 2, 16, total, fnv(inter)))

    # 10. q204 fixture: 24-bit mono, 8000 Hz, 2000 samples -> 250 ms
    x = sig(27, 2000, 5000000)
    frames = [[x[0:512]], [x[512:1024]], [x[1024:1536]], [x[1536:2000]]]
    full, total = build("tune_o", 8000, 24, frames, ["indep"] * 4,
                        [[("lpc", 6, [90, -45, 22, -11, 5, -2], 7, 8, 1, 1, None)],
                         [("fixed", 3, 2, 0, None)],
                         [("fixed", 4, 0, 1, None)],
                         [("fixed", 2, 0, 0, None)]],
                        [512, 512, 512, 464])
    oracle.append(("tune_o.flac", 8000, 1, 24, total, fnv(full[0])))

    # WAV fixture expectations for q204 (Fixtures.wavBytes pattern:
    # interleaved int16 sample i = i % 251)
    for fname, sr, ch, frames_n in [("clip_a.wav", 8000, 1, 4000),
                                    ("clip_b.wav", 16000, 2, 12000)]:
        inter = [(i % 251) for i in range(frames_n * ch)]
        oracle.append((fname, sr, ch, 16, frames_n, fnv(inter)))

    print("-- q204 oracle rows (file, sample_rate, channels, bits, n_samples, pcm_fp)")
    for row in sorted(oracle):
        print(row)


if __name__ == "__main__":
    main()
