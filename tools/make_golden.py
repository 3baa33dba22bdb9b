# Build the committed golden fixtures under src/test/resources/golden/.
#
# Every expected value here is computed by an INDEPENDENT reimplementation —
# no Spark, no JVM: python zlib for DEFLATE lengths, struct-based container
# header parsing for image dimensions, and a from-scratch replication of
# java.util.Random + the LSH/IVF math (float64 numpy) for the ANN top-k.
# The fixtures therefore act as true oracles for the gate queries that DuckDB
# cannot express natively (deflate, seeded-hash candidate generation).
#
# Usage: python3 tools/make_golden.py [sfDir]   (default /root/testdata/sf0.01)
import io
import math
import struct
import sys
import wave
import zlib

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUT = "src/test/resources/golden"


# ---------------------------------------------------------------------------
# java.util.Random replication (LCG + Marsaglia polar nextGaussian), needed to
# reproduce the seeded hyperplanes of Ann.hyperplanes / scala.util.Random(42)
# ---------------------------------------------------------------------------
class JavaRandom:
    MASK = (1 << 48) - 1

    def __init__(self, seed):
        self.seed = (seed ^ 0x5DEECE66D) & self.MASK
        self.next_gaussian_cache = None

    def _next(self, bits):
        self.seed = (self.seed * 0x5DEECE66D + 0xB) & self.MASK
        return self.seed >> (48 - bits)

    def next_double(self):
        return ((self._next(26) << 27) + self._next(27)) * (2.0 ** -53)

    def next_gaussian(self):
        if self.next_gaussian_cache is not None:
            g, self.next_gaussian_cache = self.next_gaussian_cache, None
            return g
        while True:
            v1 = 2 * self.next_double() - 1
            v2 = 2 * self.next_double() - 1
            s = v1 * v1 + v2 * v2
            if 0 < s < 1:
                break
        multiplier = math.sqrt(-2 * math.log(s) / s)
        self.next_gaussian_cache = v2 * multiplier
        return v1 * multiplier


def hyperplanes(bands, bits, dim, seed):
    """Array.fill(bands, bits)(Array.fill(dim)(rng.nextGaussian().toFloat))"""
    rng = JavaRandom(seed)
    out = np.empty((bands, bits, dim), dtype=np.float32)
    for b in range(bands):
        for j in range(bits):
            for i in range(dim):
                out[b, j, i] = np.float32(rng.next_gaussian())
    return out


# ---------------------------------------------------------------------------
# image container header parsing (independent of graft.multimodal.ImageHeaders)
# ---------------------------------------------------------------------------
def png_dims(b):
    if b[:8] != b"\x89PNG\r\n\x1a\n" or len(b) < 24 or b[12:16] != b"IHDR":
        return None
    w, h = struct.unpack(">II", b[16:24])
    return ("png", w, h) if w > 0 and h > 0 else None


def jpeg_dims(b):
    if len(b) < 4 or b[0] != 0xFF or b[1] != 0xD8:
        return None
    i = 2
    while i + 3 < len(b):
        if b[i] != 0xFF:
            return None
        j = i + 1
        while j < len(b) and b[j] == 0xFF:
            j += 1
        if j + 2 >= len(b):
            return None
        m = b[j]
        if m == 0x01 or 0xD0 <= m <= 0xD8:
            i = j + 1
            continue
        if m == 0xD9:
            return None
        ln = struct.unpack(">H", b[j + 1:j + 3])[0]
        if ln < 2:
            return None
        if 0xC0 <= m <= 0xCF and m not in (0xC4, 0xC8, 0xCC):
            if j + 8 >= len(b):
                return None
            h, w = struct.unpack(">HH", b[j + 4:j + 8])
            return ("jpeg", w, h) if w > 0 and h > 0 else None
        i = j + 1 + ln
    return None


def gif_dims(b):
    if len(b) < 10 or b[:4] != b"GIF8" or b[4:6] not in (b"7a", b"9a"):
        return None
    w, h = struct.unpack("<HH", b[6:10])
    return ("gif", w, h) if w > 0 and h > 0 else None


def bmp_dims(b):
    if len(b) < 26 or b[:2] != b"BM":
        return None
    dib = struct.unpack("<I", b[14:18])[0]
    if dib == 12:
        w, h = struct.unpack("<HH", b[18:22])
    elif dib >= 40 and len(b) >= 30:
        w, h = struct.unpack("<ii", b[18:26])
        h = abs(h)
    else:
        return None
    return ("bmp", w, h) if w > 0 and h > 0 else None


def image_dims(b):
    for f in (png_dims, jpeg_dims, gif_dims, bmp_dims):
        d = f(b)
        if d:
            return d
    return None


def entropy(b):
    if not b:
        return 0.0
    counts = np.bincount(np.frombuffer(b, dtype=np.uint8), minlength=256)
    p = counts[counts > 0] / len(b)
    # match the kernel's p * (log(p) / log(2)) formulation
    return float(-np.sum(p * (np.log(p) / np.log(2.0))))


def make_images_fixture():
    files = ["git-logo.png", "git-favicon.png", "thin-white-stripe.jpg", "DP153539.jpg"]
    rows = []
    for i, f in enumerate(files):
        payload = open(f"{OUT}/{f}", "rb").read()
        dims = image_dims(payload)
        assert dims, f
        fmt, w, h = dims
        rows.append((i, f, payload, fmt, w, h, len(payload), entropy(payload)))
    # synthetic GIF + BMP (fixed trivial layouts) and a non-image payload
    gif = b"GIF89a" + struct.pack("<HH", 10, 5) + b"\x00\x00\x00;"
    rows.append((len(rows), "synthetic.gif", gif, "gif", 10, 5, len(gif), entropy(gif)))
    bmp = bytearray(30)
    bmp[0:2] = b"BM"
    bmp[14:18] = struct.pack("<I", 40)
    bmp[18:26] = struct.pack("<ii", 3, 2)
    bmp = bytes(bmp)
    rows.append((len(rows), "synthetic.bmp", bmp, "bmp", 3, 2, len(bmp), entropy(bmp)))
    txt = b"This is not an image payload."
    rows.append((len(rows), "not-image.txt", txt, None, None, None, len(txt), entropy(txt)))

    table = pa.table({
        "img_id": pa.array([r[0] for r in rows], pa.int64()),
        "filename": pa.array([r[1] for r in rows], pa.string()),
        "payload": pa.array([r[2] for r in rows], pa.binary()),
        "format": pa.array([r[3] for r in rows], pa.string()),
        "width": pa.array([r[4] for r in rows], pa.int32()),
        "height": pa.array([r[5] for r in rows], pa.int32()),
        "n_bytes": pa.array([r[6] for r in rows], pa.int64()),
        "entropy": pa.array([r[7] for r in rows], pa.float64()),
    })
    pq.write_table(table, f"{OUT}/images.parquet")
    print(f"images.parquet: {len(rows)} rows")


def wav_info(b):
    """Independent RIFF/WAVE chunk walk (not the python wave module)."""
    if len(b) < 44 or b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        return None
    channels = rate = bits = block = None
    data_bytes = None
    i = 12
    while i + 8 <= len(b):
        cid = b[i:i + 4]
        size = struct.unpack("<I", b[i + 4:i + 8])[0]
        if cid == b"fmt " and i + 24 <= len(b):
            channels, rate = struct.unpack("<HI", b[i + 10:i + 16])
            block, bits = struct.unpack("<HH", b[i + 20:i + 24])
        elif cid == b"data":
            data_bytes = size
        i += 8 + size + (size & 1)
    if not channels or not rate or not bits:
        return None
    frames = data_bytes // block if data_bytes is not None and block else None
    return channels, rate, bits, frames


def make_audio_fixture():
    # real WAV payloads written by the python stdlib `wave` module, expected
    # facts re-parsed by the independent chunk walk above
    rows = []
    specs = [(1, 8000, 1), (2, 44100, 2), (1, 16000, 2)]  # (channels, rate, width bytes)
    for i, (ch, rate, width) in enumerate(specs):
        buf = io.BytesIO()
        w = wave.open(buf, "wb")
        w.setnchannels(ch)
        w.setsampwidth(width)
        w.setframerate(rate)
        n = 100 + 37 * i
        frames = bytes((7 * k + i) % 256 for k in range(n * ch * width))
        w.writeframes(frames)
        w.close()
        payload = buf.getvalue()
        info = wav_info(payload)
        assert info, specs[i]
        rows.append((i, payload, info[0], info[1], info[2], info[3], len(payload)))
    rows.append((len(rows), b"just some text, not RIFF", None, None, None, None, 24))
    table = pa.table({
        "audio_id": pa.array([r[0] for r in rows], pa.int64()),
        "payload": pa.array([r[1] for r in rows], pa.binary()),
        "channels": pa.array([r[2] for r in rows], pa.int32()),
        "sample_rate": pa.array([r[3] for r in rows], pa.int32()),
        "bits_per_sample": pa.array([r[4] for r in rows], pa.int32()),
        "n_frames": pa.array([r[5] for r in rows], pa.int64()),
        "n_bytes": pa.array([r[6] for r in rows], pa.int64()),
    })
    pq.write_table(table, f"{OUT}/audio.parquet")
    print(f"audio.parquet: {len(rows)} rows")


# ---------------------------------------------------------------------------
# video container fixtures: synthetic ISO-BMFF (MP4) and RIFF/AVI payloads
# built box-by-box with struct — the expected values ARE the construction
# parameters, independent of the JVM parser by definition
# ---------------------------------------------------------------------------
def mp4_box(typ, payload, largesize=False):
    if largesize:
        return struct.pack(">I", 1) + typ + struct.pack(">Q", 16 + len(payload)) + payload
    return struct.pack(">I", 8 + len(payload)) + typ + payload


def mp4_mvhd(timescale, duration, version=0):
    if version == 1:
        p = b"\x01\x00\x00\x00" + struct.pack(">QQIQ", 0, 0, timescale, duration)
    else:
        p = b"\x00\x00\x00\x00" + struct.pack(">IIII", 0, 0, timescale, duration)
    # rate, volume, reserved, matrix, pre_defined, next_track_ID
    return mp4_box(b"mvhd", p + struct.pack(">I", 0x00010000) + b"\x01\x00" +
                   b"\x00" * 10 + b"\x00" * 36 + b"\x00" * 24 + struct.pack(">I", 2))


def mp4_tkhd(width, height, version=0):
    if version == 1:
        head = b"\x01\x00\x00\x07" + struct.pack(">QQIIQ", 0, 0, 1, 0, 0)
    else:
        head = b"\x00\x00\x00\x07" + struct.pack(">IIIII", 0, 0, 1, 0, 0)
    tail = (b"\x00" * 8 + b"\x00" * 2 + b"\x00" * 2 + b"\x00" * 2 + b"\x00" * 2 +
            b"\x00" * 36 + struct.pack(">II", width << 16, height << 16))
    return mp4_box(b"tkhd", head + tail)


def make_mp4(width, height, timescale, duration, version=0,
             audio_track_first=False, largesize_moov=False):
    ftyp = mp4_box(b"ftyp", b"isom" + struct.pack(">I", 512) + b"isomiso2mp41")
    traks = [mp4_box(b"trak", mp4_tkhd(width, height, version))]
    if audio_track_first:
        traks.insert(0, mp4_box(b"trak", mp4_tkhd(0, 0, version)))
    moov_payload = mp4_mvhd(timescale, duration, version) + b"".join(traks)
    moov = mp4_box(b"moov", moov_payload, largesize=largesize_moov)
    free = mp4_box(b"free", b"\x00" * 16)
    return ftyp + moov + free + mp4_box(b"mdat", b"\xab" * 64)


def make_avi(width, height, us_per_frame, total_frames):
    avih = struct.pack("<IIIIIIIIII", us_per_frame, 0, 0, 0, total_frames,
                       0, 1, 0, width, height) + b"\x00" * 16
    avih_chunk = b"avih" + struct.pack("<I", len(avih)) + avih
    hdrl = b"hdrl" + avih_chunk
    lst = b"LIST" + struct.pack("<I", len(hdrl)) + hdrl
    movi = b"LIST" + struct.pack("<I", 4) + b"movi"
    body = b"AVI " + lst + movi
    return b"RIFF" + struct.pack("<I", len(body)) + body


def make_video_fixture():
    rows = []  # (payload, format, width, height, duration_ms, n_frames)
    # duration_ms = duration * 1000 // timescale (floor, both engines)
    rows.append((make_mp4(640, 360, 1000, 5000), "mp4", 640, 360, 5000, None))
    rows.append((make_mp4(1920, 1080, 90000, 630000, version=1,
                          audio_track_first=True), "mp4", 1920, 1080, 7000, None))
    rows.append((make_mp4(320, 240, 600, 901, largesize_moov=True),
                 "mp4", 320, 240, 901 * 1000 // 600, None))
    rows.append((make_avi(1280, 720, 33333, 300), "avi", 1280, 720,
                 300 * 33333 // 1000, 300))
    # a clip SHORTER than typical frame-sample k: exercises the
    # sampleFrames per-video index dedup (2 frames -> 2 rows, not k)
    rows.append((make_avi(160, 120, 500000, 2), "avi", 160, 120,
                 2 * 500000 // 1000, 2))
    # miss cases: plain text, and RIFF-but-WAVE (audio, not AVI)
    rows.append((b"definitely not a video payload....", None, None, None, None, None))
    wav_hdr = b"RIFF" + struct.pack("<I", 36) + b"WAVE" + b"fmt " + struct.pack("<I", 16) + b"\x00" * 16
    rows.append((wav_hdr, None, None, None, None, None))

    table = pa.table({
        "video_id": pa.array(range(len(rows)), pa.int64()),
        "payload": pa.array([r[0] for r in rows], pa.binary()),
        "format": pa.array([r[1] for r in rows], pa.string()),
        "width": pa.array([r[2] for r in rows], pa.int32()),
        "height": pa.array([r[3] for r in rows], pa.int32()),
        "duration_ms": pa.array([r[4] for r in rows], pa.int64()),
        "n_frames": pa.array([r[5] for r in rows], pa.int64()),
        "n_bytes": pa.array([len(r[0]) for r in rows], pa.int64()),
    })
    pq.write_table(table, f"{OUT}/videos.parquet")
    print(f"videos.parquet: {len(rows)} rows")


# ---------------------------------------------------------------------------
# HTML extraction with numeric-entity DECODE: an independent python
# replication of the strip_html chain with decodeNumericEntities=true (the
# kernel rules: valid refs -> code point; whitespace-class/control/invalid
# -> one space; malformed stay literal). The whitespace classification
# replicates java.lang.Character.isWhitespace explicitly (NOT python
# str.isspace, which disagrees on U+2007/U+202F/U+180E), so the fixture is
# correct for arbitrary document text, not just the planted set.
# ---------------------------------------------------------------------------
def make_html_fixture():
    import re
    import unicodedata

    def java_is_whitespace(cp):
        # java.lang.Character.isWhitespace: Unicode space separators EXCEPT
        # the non-breaking ones (U+00A0, U+2007, U+202F), plus line/paragraph
        # separators and the legacy control set \t \n \v \f \r \x1c-\x1f
        if 0x09 <= cp <= 0x0D or 0x1C <= cp <= 0x1F:
            return True
        if cp in (0xA0, 0x2007, 0x202F):
            return False
        return unicodedata.category(chr(cp)) in ("Zs", "Zl", "Zp")

    def decode_numeric(s):
        out, i = [], 0
        while True:
            j = s.find("&#", i)
            if j < 0:
                out.append(s[i:])
                break
            out.append(s[i:j])
            k = j + 2
            hexmode = k < len(s) and s[k] in "xX"
            if hexmode:
                k += 1
            d0, maxd = k, (6 if hexmode else 8)
            digits = "0123456789abcdefABCDEF" if hexmode else "0123456789"
            while k < len(s) and k - d0 < maxd and s[k] in digits:
                k += 1
            if k > d0 and k < len(s) and s[k] == ";":
                cp = int(s[d0:k], 16 if hexmode else 10)
                invalid = cp > 0x10FFFF or cp == 0 or 0xD800 <= cp <= 0xDFFF
                spacelike = (not invalid) and (
                    cp == 0xA0 or cp < 0x20 or 0x7F <= cp <= 0x9F
                    or java_is_whitespace(cp))
                out.append(" " if (invalid or spacelike) else chr(cp))
                i = k + 1
            else:
                out.append("&#")  # malformed: literal, resume after marker
                i = j + 2
        return "".join(out)

    def strip_html_decoded(h):
        h = re.sub(r"(?is)<script\b[^>]*>.*?</script>|<style\b[^>]*>.*?</style>", " ", h)
        h = re.sub(r"(?s)<!--.*?-->", " ", h)
        h = re.sub(r"<[^>]*>", " ", h)
        for pat, rep in [("&nbsp;", " "), ("&lt;", "<"), ("&gt;", ">"),
                         ("&quot;", '"'), ("&apos;", "'")]:
            h = h.replace(pat, rep)
        h = decode_numeric(h)
        h = h.replace("&amp;", "&")
        return re.sub(r"[ \t\r\n]+", " ", h).strip()

    docs = pq.read_table(f"{SF}/documents.parquet",
                         columns=["doc_id", "text"]).to_pandas()
    planted = [
        "<p>&#65;&#66;C</p>",                                   # decimal refs
        "<div>smile &#x1F600; now</div>",                       # astral hex ref
        "caf&#233; and&#160;joined",                            # e-acute; nbsp ref -> space
        "bell&#7;control &#xD800; bad &#1114111;ok",            # control/surrogate -> space; max cp valid
        "over &#1114112; flow &#0; nul",                        # out of range / NUL -> space
        "malformed &#; and &#xZZ; and &#x; stay",               # literal
        "<script>var x=&#65;;</script>kept &lt;b&gt; &amp;amp; &#38;",
        "amp shields: double&amp;#65;no decode",                # &-last ordering
        "line&#10;break&#x9;tab &#8232;ls",                     # ws-class refs -> space
    ]
    ids, htmls, cleans = [], [], []
    for i, p in enumerate(planted):
        ids.append(int(-(i + 1)))  # planted rows: negative ids
        htmls.append(p)
        cleans.append(strip_html_decoded(p))
    # plus every real document wrapped in the html_extract gate's synthetic
    # markup, with a numeric-ref tail the space-mode gate cannot cover
    for doc_id, text in zip(docs.doc_id, docs.text):
        h = ("<html><head><style>p{color:red}</style>"
             "<script type=\"text/javascript\">var x=1;</script></head>"
             "<body><!-- crawl artifact --><p>" + (text or "") +
             "</p><div>&#84;ail &#x21; &quot;q&quot;</div></body></html>")
        ids.append(int(doc_id))
        htmls.append(h)
        cleans.append(strip_html_decoded(h))
    table = pa.table({
        "html_id": pa.array(ids, pa.int64()),
        "html": pa.array(htmls, pa.string()),
        "clean_text": pa.array(cleans, pa.string()),
    })
    pq.write_table(table, f"{OUT}/html.parquet")
    print(f"html.parquet: {len(ids)} rows")

    # -----------------------------------------------------------------------
    # full-entity mode (strip_html with decodeNamedEntities=true): ONE
    # left-to-right pass decodes the FULL WHATWG HTML5 named set (2,125
    # semicolon-terminated names incl. the 93 multi-codepoint math forms)
    # AND numeric refs together. Independent replication: python's stdlib
    # html.entities.html5 IS the public WHATWG table — the kernel's table
    # file is generated from the same public data, but the decode LOGIC
    # here is written independently of the kernel's.
    # -----------------------------------------------------------------------
    from html.entities import html5
    named_table = {n[:-1]: v for n, v in html5.items() if n.endswith(";")}
    ENT_CHARS = ("abcdefghijklmnopqrstuvwxyz"
                 "ABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789")

    def entity_char(cp):
        invalid = cp > 0x10FFFF or cp == 0 or 0xD800 <= cp <= 0xDFFF
        spacelike = (not invalid) and (
            cp == 0xA0 or cp < 0x20 or 0x7F <= cp <= 0x9F
            or java_is_whitespace(cp))
        return " " if (invalid or spacelike) else chr(cp)

    def decode_html(s):
        out, i = [], 0
        while True:
            j = s.find("&", i)
            if j < 0:
                out.append(s[i:])
                break
            out.append(s[i:j])
            if j + 1 < len(s) and s[j + 1] == "#":
                k = j + 2
                hexmode = k < len(s) and s[k] in "xX"
                if hexmode:
                    k += 1
                d0, maxd = k, (6 if hexmode else 8)
                digits = "0123456789abcdefABCDEF" if hexmode else "0123456789"
                while k < len(s) and k - d0 < maxd and s[k] in digits:
                    k += 1
                if k > d0 and k < len(s) and s[k] == ";":
                    out.append(entity_char(int(s[d0:k], 16 if hexmode else 10)))
                    i = k + 1
                else:
                    out.append("&#")
                    i = j + 2
            else:
                k = j + 1
                while k < len(s) and k - j - 1 < 32 and s[k] in ENT_CHARS:
                    k += 1
                val = (named_table.get(s[j + 1:k])
                       if k > j + 1 and k < len(s) and s[k] == ";" else None)
                if val is not None:
                    # per-codepoint, sharing the numeric path's space-like
                    # normalization (multi-codepoint html5 forms included)
                    out.append("".join(entity_char(ord(c)) for c in val))
                    i = k + 1
                else:
                    out.append("&")
                    i = j + 1
        return "".join(out)

    def strip_html_entities(h):
        h = re.sub(r"(?is)<script\b[^>]*>.*?</script>|<style\b[^>]*>.*?</style>", " ", h)
        h = re.sub(r"(?s)<!--.*?-->", " ", h)
        h = re.sub(r"<[^>]*>", " ", h)
        h = decode_html(h)
        return re.sub(r"[ \t\r\n]+", " ", h).strip()

    planted_named = [
        "caf&eacute; &mdash; d&eacute;j&agrave; vu &hellip; done",
        "<p>&Omega; &alpha; &infin; &ne; &le; &ge; &radic;</p>",
        "A&nbsp;B&ensp;C&emsp;D&thinsp;E spaces",                # Zs refs -> space
        "&amp;eacute; one level only; &amp;amp; and &amp;#65; too",
        "&foo; unknown &fake123; stays &apos;quoted&apos;",
        "&ampx no-semi literal; &eacute no-semi literal; tail",
        "&copy;&reg;&trade; &euro;&pound;&yen; &laquo;q&raquo;",
        "&lt;tag&gt; &quot;q&quot; mixed &#65;&eacute;&#x42;",
        "&shy;soft&zwnj;join&lrm;marks decode as-is",            # Cf refs kept
        "&thisisaverylongentitynamepastlimitxx; over the 32-char name cap",
        "<script>&mdash;</script>dropped &curren; &Prime; &permil;",
        # html5-only hazards: multi-codepoint math forms, the fj ligature
        # pair, a two-space-like value, case-sensitive siblings, and a
        # deep name at the length frontier
        "&NotEqualTilde; &bne; &acE; multi-codepoint forms",
        "&fjlig; spells fj; &ThickSpace;collapses",
        "&Dagger; vs &dagger;; &DD; vs &dd;; &And; vs &and;",
        "&CounterClockwiseContourIntegral; longest name decodes",
        "&angst; &angmsdaa; &bemptyv; newer names; &notarealname; stays",
    ]
    ids2, htmls2, cleans2 = [], [], []
    for i, p in enumerate(planted_named):
        ids2.append(int(-(i + 1)))
        htmls2.append(p)
        cleans2.append(strip_html_entities(p))
    for doc_id, text in zip(docs.doc_id, docs.text):
        h = ("<html><head><style>p{color:red}</style></head>"
             "<body><!-- x --><p>" + (text or "") +
             "</p><div>&eacute;tail &mdash; &#84; &amp;lt; &bogus;</div></body></html>")
        ids2.append(int(doc_id))
        htmls2.append(h)
        cleans2.append(strip_html_entities(h))
    table2 = pa.table({
        "html_id": pa.array(ids2, pa.int64()),
        "html": pa.array(htmls2, pa.string()),
        "clean_text": pa.array(cleans2, pa.string()),
    })
    pq.write_table(table2, f"{OUT}/html_entities.parquet")
    print(f"html_entities.parquet: {len(ids2)} rows")


# ---------------------------------------------------------------------------
# URL canonicalization: an independent replication of the UrlKernel rules
# (documented at VectorKernels.canonicalizeUrl) over planted hazard URLs +
# synthetic per-doc URL pairs whose canonical forms collide (the dedup case)
# ---------------------------------------------------------------------------
def make_url_fixture():
    TRACKING = {"gclid", "fbclid", "ref", "mc_cid", "mc_eid", "igshid",
                "msclkid", "dclid", "wbraid", "gbraid"}
    MULTI = {"co.uk", "ac.uk", "gov.uk", "org.uk", "me.uk", "co.jp", "ne.jp",
             "or.jp", "ac.jp", "go.jp", "com.au", "net.au", "org.au",
             "edu.au", "gov.au", "co.nz", "org.nz", "net.nz", "com.br",
             "org.br", "com.mx", "co.in", "net.in", "org.in", "co.za",
             "com.sg", "com.cn", "org.cn", "net.cn", "com.tw", "com.hk",
             "co.kr", "com.ar", "com.tr", "com.pl"}

    def canon(u):
        s = u.strip()
        si = s.find("://")
        if si <= 0:
            return s
        scheme = s[:si].lower()
        rest = s[si + 3:]
        he = len(rest)
        for i, c in enumerate(rest):
            if c in "/?#":
                he = i
                break
        hostport = rest[:he].lower()
        ci = hostport.rfind(":")
        host, port = hostport, ""
        if ci >= 0:
            p = hostport[ci + 1:]
            if all("0" <= c <= "9" for c in p):
                host, port = hostport[:ci], p
        if host.startswith("www.") and len(host) > 4:
            host = host[4:]
        keep_port = bool(port) and not (
            (scheme == "http" and port == "80")
            or (scheme == "https" and port == "443"))
        after = rest[he:]
        fi = after.find("#")
        nofrag = after[:fi] if fi >= 0 else after
        qi = nofrag.find("?")
        path = nofrag[:qi] if qi >= 0 else nofrag
        query = nofrag[qi + 1:] if qi >= 0 else ""
        if path == "/":
            path = ""
        elif len(path) > 1 and path.endswith("/"):
            path = path[:-1]

        def tracking(p):
            eq = p.find("=")
            name = (p[:eq] if eq >= 0 else p).lower()
            return name.startswith("utm_") or name in TRACKING

        params = sorted(p for p in query.split("&") if p and not tracking(p))
        q2 = ("?" + "&".join(params)) if params else ""
        return scheme + "://" + host + ((":" + port) if keep_port else "") + path + q2

    def host_of(u):
        c = canon(u)
        si = c.find("://")
        if si <= 0:
            return ""
        rest = c[si + 3:]
        he = len(rest)
        for i, ch in enumerate(rest):
            if ch in "/?:":
                he = i
                break
        return rest[:he]

    def domain_of(u):
        h = host_of(u)
        if not h:
            return ""
        labels = h.split(".")
        if len(labels) <= 2:
            return h
        if all(l and all("0" <= c <= "9" for c in l) for l in labels):
            return h
        last2 = ".".join(labels[-2:])
        return ".".join(labels[-3:]) if last2 in MULTI else last2

    planted = [
        "HTTPS://WWW.Example.COM:443/Path/Sub/?utm_source=x&b=2&a=1#frag",
        "http://example.com:8080/a/",
        "http://www.example.co.uk/",
        "https://sub.deep.example.com/x?gclid=123",
        "http://192.168.0.1:80/admin/",
        "not a url at all",
        "ftp://Files.Example.org/pub/",
        "https://example.com/?",
        "https://example.com/a?b=2&a=1&utm_campaign=z&UTM_Medium=y",
        "http://www.only",
        "https://example.com:444/x",
        "  http://example.com/x  ",
        "https://www.news.com.au/story/",
        "http://example.com/a//b/",
        "http://EXAMPLE.com/A#b#c",
        "http://example.com?x=1",
        "https://www.x.co.jp:443/?fbclid=1&z=9",
        "http://a.b.c.d.example.com/x",
        "http://example.com:notaport/x",
        "http://example.com:/x",
    ]
    docs = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id"]).to_pandas()
    ids, urls = [], []
    for i, u in enumerate(planted):
        ids.append(int(-(i + 1)))
        urls.append(u)
    # per-doc PAIR with colliding canonicals: even id = noisy variant,
    # odd id = already-canonical variant -> dedup keeps the even (smaller)
    for doc_id in docs.doc_id:
        m = int(doc_id) % 50
        ids.append(int(2 * doc_id))
        urls.append(f"https://WWW.Site{m}.COM:443/path/{int(doc_id)}/"
                    f"?utm_source=feed&b=2&a=1#frag")
        ids.append(int(2 * doc_id + 1))
        urls.append(f"https://site{m}.com/path/{int(doc_id)}?a=1&b=2")
    table = pa.table({
        "url_id": pa.array(ids, pa.int64()),
        "url": pa.array(urls, pa.string()),
        "canonical": pa.array([canon(u) for u in urls], pa.string()),
        "host": pa.array([host_of(u) for u in urls], pa.string()),
        "domain": pa.array([domain_of(u) for u in urls], pa.string()),
    })
    pq.write_table(table, f"{OUT}/urls_sf001.parquet")
    print(f"urls_sf001.parquet: {len(ids)} rows")


# ---------------------------------------------------------------------------
# BPE tokenization: an independent replication of graft.text.Bpe — ascii
# word count, numMerges deterministic merge-learning rounds (max pair count,
# ties -> lexicographically smallest pair), greedy lowest-rank-first encode
# with one left-to-right non-overlapping replacement pass per merge.
# Lowercasing is ASCII-only (A-Z), matching the kernel tokenizer.
# ---------------------------------------------------------------------------
def make_bpe_fixture():
    import re
    import string
    from collections import Counter

    NUM_MERGES = 200
    ascii_lower = str.maketrans(string.ascii_uppercase, string.ascii_lowercase)

    def words_of(t):
        return re.findall(r"[a-z0-9]+", (t or "").translate(ascii_lower))

    def merge_pair(syms, pair):
        out, i = [], 0
        while i < len(syms):
            if i < len(syms) - 1 and syms[i] == pair[0] and syms[i + 1] == pair[1]:
                out.append(syms[i] + syms[i + 1])
                i += 2
            else:
                out.append(syms[i])
                i += 1
        return out

    docs = pq.read_table(f"{SF}/documents.parquet",
                         columns=["doc_id", "text"]).to_pandas()
    wc = Counter()
    for t in docs.text:
        wc.update(words_of(t))
    items = sorted(((w, c) for w, c in wc.items() if len(w) >= 2),
                   key=lambda x: (-x[1], x[0]))[:1 << 20]
    seqs = [(list(w), c) for w, c in items]
    merges = []
    for _ in range(NUM_MERGES):
        pc = Counter()
        for syms, c in seqs:
            for i in range(len(syms) - 1):
                pc[(syms[i], syms[i + 1])] += c
        if not pc:
            break
        best = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        seqs = [(merge_pair(syms, best), c) for syms, c in seqs]
    ranks = {}
    for i, m in enumerate(merges):
        ranks.setdefault(m, i)

    memo = {}

    def encode_word(w):
        if w in memo:
            return memo[w]
        syms = list(w)
        while len(syms) > 1:
            best = None
            for i in range(len(syms) - 1):
                r = ranks.get((syms[i], syms[i + 1]))
                if r is not None and (best is None or r < best[0]):
                    best = (r, syms[i], syms[i + 1])
            if best is None:
                break
            syms = merge_pair(syms, (best[1], best[2]))
        memo[w] = syms
        return syms

    ids, counts, texts = [], [], []
    for doc_id, t in zip(docs.doc_id, docs.text):
        toks = [s for w in words_of(t) for s in encode_word(w)]
        ids.append(int(doc_id))
        counts.append(len(toks))
        texts.append(" ".join(toks))
    table = pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "n_bpe_tokens": pa.array(counts, pa.int64()),
        "bpe_text": pa.array(texts, pa.string()),
    })
    pq.write_table(table, f"{OUT}/bpe_tokens_sf001.parquet")
    print(f"bpe_tokens_sf001.parquet: {len(ids)} rows, "
          f"{len(merges)} merges, vocab sample {merges[:5]}")


# ---------------------------------------------------------------------------
# Byte-level BPE (GPT-2 lineage): independent replication of the WHOLE
# graft.text.ByteBpe algorithm — the byte-class pre-token scanner, the
# frequency-table cap ordering (count desc, display-token UTF-8 bytes asc),
# the merge loop with smallest-(left,right)-byte-pair tie-break, and the
# greedy lowest-rank encode. Symbols are python bytes; display mapping is
# the standard printable byte<->unicode table (0x20 -> 'Ġ').
# ---------------------------------------------------------------------------
_BB_B2C = {}


def _bb_b2c():
    if not _BB_B2C:
        printable = set(range(ord("!"), ord("~") + 1)) \
            | set(range(0xA1, 0xAC + 1)) | set(range(0xAE, 0xFF + 1))
        n = 0
        for b in range(256):
            if b in printable:
                _BB_B2C[b] = chr(b)
            else:
                _BB_B2C[b] = chr(256 + n)
                n += 1
    return _BB_B2C


def bb_disp(bs):
    b2c = _bb_b2c()
    return "".join(b2c[b] for b in bs)


def _bb_cls(b):
    if (0x09 <= b <= 0x0D) or b == 0x20:
        return 0
    if (65 <= b <= 90) or (97 <= b <= 122) or b >= 0x80:
        return 1
    if 48 <= b <= 57:
        return 2
    return 3


def _bb_contraction_len(bs, i):
    if bs[i] != 0x27:
        return 0
    m = len(bs)
    if i + 1 < m:
        c1 = bs[i + 1]
        if c1 in (ord("s"), ord("t"), ord("m"), ord("d")):
            return 2
        if i + 2 < m and (c1, bs[i + 2]) in (
                (ord("r"), ord("e")), (ord("v"), ord("e")),
                (ord("l"), ord("l"))):
            return 3
    return 0


def bb_pretokenize(bs):
    out, i, m = [], 0, len(bs)
    while i < m:
        b = bs[i]
        cl = _bb_contraction_len(bs, i)
        if cl:
            out.append(bs[i:i + cl])
            i += cl
        elif _bb_cls(b) == 0:
            j = i + 1
            while j < m and _bb_cls(bs[j]) == 0:
                j += 1
            if j == m:
                out.append(bs[i:j]); i = j
            elif j - i > 1:
                # the \s+(?!\S) backtrack: run minus its last byte
                out.append(bs[i:j - 1]); i = j - 1
            elif b == 0x20:
                # single space attaches to the following class run
                c = _bb_cls(bs[i + 1])
                k = i + 2
                while k < m and _bb_cls(bs[k]) == c:
                    k += 1
                out.append(bs[i:k]); i = k
            else:
                out.append(bs[i:i + 1]); i += 1
        else:
            c = _bb_cls(b)
            k = i + 1
            while k < m and _bb_cls(bs[k]) == c:
                k += 1
            out.append(bs[i:k]); i = k
    return out


def _bb_merge_pair(syms, pair):
    out, i = [], 0
    while i < len(syms):
        if i < len(syms) - 1 and syms[i] == pair[0] and syms[i + 1] == pair[1]:
            out.append(syms[i] + syms[i + 1])
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return out


def bb_train(texts, num_merges, max_words=1 << 20, min_freq=1):
    """Replicates graft.text.ByteBpe.train: pre-token frequency table
    capped by (count desc, display-token UTF-8 bytes asc), merge loop
    with smallest-(left,right)-byte-pair tie-break. Returns rank dict."""
    from collections import Counter
    wc = Counter()
    for t in texts:
        wc.update(bb_pretokenize((t or "").encode("utf-8")))
    items = sorted(((w, c) for w, c in wc.items()
                    if len(w) >= 2 and c >= min_freq),
                   key=lambda x: (-x[1], bb_disp(x[0]).encode("utf-8")))[:max_words]
    from collections import Counter as C2
    seqs = [([bytes([x]) for x in w], c) for w, c in items]
    merges = []
    for _ in range(num_merges):
        pc = C2()
        for syms, c in seqs:
            for i in range(len(syms) - 1):
                pc[(syms[i], syms[i + 1])] += c
        if not pc:
            break
        best = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        seqs = [(_bb_merge_pair(syms, best), c) for syms, c in seqs]
    ranks = {}
    for i, mg in enumerate(merges):
        ranks.setdefault(mg, i)
    return ranks, merges


def bb_encoder(ranks):
    """Greedy lowest-rank encoder over latin-1 pre-tokens (memoized);
    returns a text -> [display tokens] function."""
    memo = {}

    def encode_pretoken(w):
        if w in memo:
            return memo[w]
        syms = [bytes([x]) for x in w]
        while len(syms) > 1:
            best = None
            for i in range(len(syms) - 1):
                r = ranks.get((syms[i], syms[i + 1]))
                if r is not None and (best is None or r < best[0]):
                    best = (r, syms[i], syms[i + 1])
            if best is None:
                break
            syms = _bb_merge_pair(syms, (best[1], best[2]))
        memo[w] = syms
        return syms

    def encode_text(t):
        return [bb_disp(s) for w in bb_pretokenize((t or "").encode("utf-8"))
                for s in encode_pretoken(w)]

    return encode_text


def make_byte_bpe_fixture():
    # 80 keeps the tiny synthetic vocabulary UNsaturated (at 200 every
    # pre-token fully merges to one symbol and the greedy-rank encode path
    # would go untested)
    NUM_MERGES = 80

    # planted hazard rows exercise every scanner path the synthetic corpus
    # lacks (contractions, case, whitespace runs, digits, punctuation,
    # multi-byte UTF-8, trailing/leading space, empty) — the SAME literals
    # the gate unions onto documents, ids -1..-8
    planted = [
        "it's the'll 've 'd mix",
        "Hello World HELLO hello",
        "a  b   c\td\ne f  ",
        "version 2.0 has 123 bugs, v2>v1!",
        "café naïve €9",
        "",
        "'s start and end'",
        "  leading spaces",
    ]
    docs = pq.read_table(f"{SF}/documents.parquet",
                         columns=["doc_id", "text"]).to_pandas()
    corpus = list(zip(docs.doc_id, docs.text)) + \
        [(-(i + 1), p) for i, p in enumerate(planted)]
    ranks, merges = bb_train([t for _, t in corpus], NUM_MERGES)
    encode_text = bb_encoder(ranks)
    ids, counts, texts = [], [], []
    for doc_id, t in corpus:
        toks = encode_text(t)
        ids.append(int(doc_id))
        counts.append(len(toks))
        texts.append(" ".join(toks))
    table = pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "n_byte_tokens": pa.array(counts, pa.int64()),
        "byte_bpe_text": pa.array(texts, pa.string()),
    })
    pq.write_table(table, f"{OUT}/byte_bpe_sf001.parquet")
    print(f"byte_bpe_sf001.parquet: {len(ids)} rows, {len(merges)} merges, "
          f"sample {[tuple(bb_disp(s) for s in m) for m in merges[:5]]}")


def make_chat_bpe_fixture():
    """Per-(doc, turn) byte-BPE token counts for chat_truncate_bpe:
    replicates the chatTranscript fixture (system + two text-slice turns
    + the %13/%17 planted violations), the per-line role parse, and the
    byte-BPE count of each turn's content under a model trained on the
    raw documents (numMerges=80 — the gate's exact parameterization)."""
    import re
    docs = pq.read_table(f"{SF}/documents.parquet",
                         columns=["doc_id", "text"]).to_pandas()
    ranks, _ = bb_train(list(docs.text), 80)
    encode_text = bb_encoder(ranks)
    role_re = re.compile(r"^(system|user|assistant|tool): ")
    ids, idxs, roles, counts = [], [], [], []
    for doc_id, text in zip(docs.doc_id, docs.text):
        if text is None:
            # chatTranscript propagates NULL through concat -> the whole
            # transcript is NULL -> explodeTurns coalesces to ONE empty
            # invalid turn (role '', 0 tokens); replicate, don't invent
            ids.append(int(doc_id))
            idxs.append(0)
            roles.append("")
            counts.append(0)
            continue
        t = text
        tr = ("system: be concise\nuser: " + t[0:40] +
              "\nassistant: " + t[40:80])
        if doc_id % 13 == 0:
            tr += "\nuser: one more\nuser: double user"
        elif doc_id % 17 == 0:
            tr += "\nbad line no colon"
        else:
            tr += "\nuser: follow up\nassistant: done"
        for i, line in enumerate(tr.split("\n")):
            m = role_re.match(line)
            role = m.group(1) if m else ""
            content = line[len(role) + 2:] if m else line
            ids.append(int(doc_id))
            idxs.append(i)
            roles.append(role)
            counts.append(len(encode_text(content)))
    pq.write_table(pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "turn_idx": pa.array(idxs, pa.int64()),
        "role": pa.array(roles, pa.string()),
        "n_tokens": pa.array(counts, pa.int64()),
    }), f"{OUT}/chat_bpe_turns_sf001.parquet")
    print(f"chat_bpe_turns_sf001.parquet: {len(ids)} rows")


# ---------------------------------------------------------------------------
# DEFLATE lengths for compression_signal (python zlib == JVM Deflater: both
# wrap the same zlib; raw stream, level 6 — verified byte-identical)
# ---------------------------------------------------------------------------
def make_deflate_fixture():
    docs = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"]).to_pandas()
    ids, lens = [], []
    for doc_id, text in zip(docs.doc_id, docs.text):
        ids.append(int(doc_id))
        if text is None:
            lens.append(None)
        else:
            c = zlib.compressobj(6, zlib.DEFLATED, -15)
            lens.append(len(c.compress(text.encode("utf-8")) + c.flush()))
    table = pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "deflate_bytes": pa.array(lens, pa.int32()),
    })
    pq.write_table(table, f"{OUT}/deflate_sf001.parquet")
    print(f"deflate_sf001.parquet: {len(ids)} rows")


# ---------------------------------------------------------------------------
# ANN goldens: replicate Ann.lshTopK / Ann.trainIvf+ivfTopK in float64 numpy
# ---------------------------------------------------------------------------
def cosine_matrix(q, c):
    """cos(q_i, c_j) with zero-norm rows scoring 0 (matches the kernel)."""
    qn = np.linalg.norm(q, axis=1)
    cn = np.linalg.norm(c, axis=1)
    dots = q @ c.T
    with np.errstate(divide="ignore", invalid="ignore"):
        cos = dots / np.outer(qn, cn)
    cos[~np.isfinite(cos)] = 0.0
    return cos


def topk_from_candidates(ids, vecs, cand, query_ids, k):
    """cand: dict query_id -> set(neighbor ids). Rank by (-cos, neighbor)."""
    idx = {v: i for i, v in enumerate(ids)}
    rows = []
    for q in query_ids:
        neighbors = sorted(cand.get(q, ()))
        if not neighbors:
            continue
        qv = vecs[idx[q]][None, :]
        nm = vecs[[idx[n] for n in neighbors]]
        cos = cosine_matrix(qv, nm)[0]
        order = sorted(range(len(neighbors)), key=lambda i: (-cos[i], neighbors[i]))
        for rank, i in enumerate(order[:k], start=1):
            rows.append((q, rank, neighbors[i]))
    return rows


def write_topk(rows, name):
    table = pa.table({
        "query_id": pa.array([r[0] for r in rows], pa.int64()),
        "rank": pa.array([r[1] for r in rows], pa.int32()),
        "neighbor_id": pa.array([r[2] for r in rows], pa.int64()),
    })
    pq.write_table(table, f"{OUT}/{name}.parquet")
    print(f"{name}.parquet: {len(rows)} rows")


def make_ann_goldens():
    emb = pq.read_table(f"{SF}/embeddings.parquet").to_pandas()
    ids = emb.vec_id.to_numpy()
    vecs32 = np.stack(emb.embedding.to_numpy()).astype(np.float32)
    vecs = vecs32.astype(np.float64)
    query_ids = [int(v) for v in ids if v < 20]

    # --- LSH (dim=64, k=3, bands=24, bits=8, seed=42) ---
    planes = hyperplanes(24, 8, 64, 42).astype(np.float64)  # (24, 8, 64)
    # buckets[v, band] = packed sign bits of dot(vec, plane[band][bit])
    dots = np.einsum("nd,bjd->nbj", vecs, planes)  # (n, 24, 8)
    bits_set = (dots > 0).astype(np.int64)
    weights = (1 << np.arange(8)).astype(np.int64)
    buckets = bits_set @ weights  # (n, 24)

    cand = {}
    for band in range(24):
        by_bucket = {}
        for i, v in enumerate(ids):
            by_bucket.setdefault(buckets[i, band], []).append(int(v))
        for members in by_bucket.values():
            qs = [m for m in members if m < 20]
            for q in qs:
                s = cand.setdefault(q, set())
                s.update(m for m in members if m != q)
    write_topk(topk_from_candidates(ids, vecs, cand, query_ids, 3), "ann_lsh_topk_sf001")

    # --- IVF (k=16, iterations=3, nprobe=3, topk=3) ---
    order = np.argsort(ids)
    centroids = vecs32[order[:16]].copy()  # init: 16 smallest ids
    for _ in range(3):
        cos = cosine_matrix(vecs, centroids.astype(np.float64))
        assign = np.argmax(cos, axis=1)  # ties -> lower index, same as kernel
        nxt = centroids.copy()
        for c in range(16):
            members = vecs[assign == c]
            if len(members):
                nxt[c] = members.mean(axis=0).astype(np.float32)
        centroids = nxt
    cen = centroids.astype(np.float64)
    cos_c = cosine_matrix(vecs, cen)
    corpus_cid = np.argmax(cos_c, axis=1)
    cand = {}
    for q in query_ids:
        qi = int(np.where(ids == q)[0][0])
        sims = cos_c[qi]
        # nprobe=3 nearest centroids, decreasing sim, ties by lower index
        probe = sorted(range(16), key=lambda c: (-sims[c], c))[:3]
        s = set()
        for c in probe:
            s.update(int(v) for v in ids[corpus_cid == c] if v != q)
        cand[q] = s
    write_topk(topk_from_candidates(ids, vecs, cand, query_ids, 3), "ann_ivf_topk_sf001")

    # corpus-map assignment golden: every vector's nearest trained centroid
    table = pa.table({
        "vec_id": pa.array([int(v) for v in ids], pa.int64()),
        "cid": pa.array([int(c) for c in corpus_cid], pa.int32()),
    })
    pq.write_table(table, f"{OUT}/kmeans_assign_sf001.parquet")
    print(f"kmeans_assign_sf001.parquet: {len(ids)} rows")

    # embedding-outlier golden (embedding_outliers, quantile 0.1): cosine to
    # the ASSIGNED centroid in fixed point, per-cluster ascending rank
    # (ties by vec_id), cutoff = floor(n_cluster * 0.1). The FLOOR makes the
    # raw value load-bearing (not just its order), so the cosine replicates
    # the Scala kernel EXACTLY: sequential accumulation in dimension order,
    # float32 elements widened per element, final dot / sqrt(na * nb) —
    # cosine_matrix (BLAS pairwise dot, sqrt(na)*sqrt(nb)) differs in the
    # last ulp and would flip boundary floors.
    import math as _math

    def kernel_cos(a32, b32):
        dot = na = nb = 0.0
        for k in range(len(a32)):
            x = float(a32[k]); y = float(b32[k])
            dot += x * y; na += x * x; nb += y * y
        return 0.0 if na == 0.0 or nb == 0.0 else dot / _math.sqrt(na * nb)

    fp = np.array([
        int(np.floor(kernel_cos(vecs32[i], centroids[int(corpus_cid[i])])
                     * (1 << 20)))
        for i in range(len(ids))], dtype=np.int64)
    order_o = sorted(range(len(ids)), key=lambda i: (corpus_cid[i], fp[i], ids[i]))
    rank = np.empty(len(ids), dtype=np.int64)
    seen = {}
    for i in order_o:
        c = int(corpus_cid[i])
        rank[i] = seen.get(c, 0)
        seen[c] = rank[i] + 1
    nclu = {c: int((corpus_cid == c).sum()) for c in set(corpus_cid.tolist())}
    cut = {c: int(np.floor(n * 0.1)) for c, n in nclu.items()}
    table = pa.table({
        "vec_id": pa.array([int(v) for v in ids], pa.int64()),
        "cid": pa.array([int(c) for c in corpus_cid], pa.int32()),
        "cos_fp": pa.array([int(x) for x in fp], pa.int64()),
        "cluster_rank": pa.array([int(r) for r in rank], pa.int64()),
        "is_outlier": pa.array(
            [bool(rank[i] < cut[int(corpus_cid[i])]) for i in range(len(ids))]),
    })
    pq.write_table(table, f"{OUT}/embedding_outliers_sf001.parquet")
    n_out = sum(1 for i in range(len(ids)) if rank[i] < cut[int(corpus_cid[i])])
    print(f"embedding_outliers_sf001.parquet: {len(ids)} rows, {n_out} flagged")

    # --- PQ (dim=64, m=8, ksub=16, iterations=3, k=3, refine=8) ---
    # replicate Pq.trainPq + pqTopK: deterministic init from the ksub
    # smallest-id vectors, Lloyd's with L2 sub-assignment (ties -> lower
    # code), ADC scoring with reconstruction-norm cosine, shortlist of
    # k*refine by (-approx, neighbor), exact-cosine re-rank.
    m, ksub, subdim, topk, refine = 8, 16, 8, 3, 8
    seeds = vecs32[order[:ksub]]  # ksub smallest ids
    cbs = np.stack([seeds[:, s * subdim:(s + 1) * subdim] for s in range(m)])
    # cbs: (m, ksub, subdim) float32
    sub64 = np.stack([vecs[:, s * subdim:(s + 1) * subdim] for s in range(m)])
    # sub64: (m, n, subdim) float64
    for _ in range(3):
        nxt = cbs.copy()
        for s in range(m):
            d = ((sub64[s][:, None, :] - cbs[s].astype(np.float64)[None, :, :]) ** 2).sum(axis=2)
            assign = np.argmin(d, axis=1)  # ties -> lower code, same as kernel
            for c in range(ksub):
                members = sub64[s][assign == c]
                if len(members):
                    nxt[s][c] = members.mean(axis=0).astype(np.float32)
        cbs = nxt
    cb64 = cbs.astype(np.float64)
    codes = np.empty((len(ids), m), dtype=np.int64)
    for s in range(m):
        d = ((sub64[s][:, None, :] - cb64[s][None, :, :]) ** 2).sum(axis=2)
        codes[:, s] = np.argmin(d, axis=1)
    norm_sq = (cb64 ** 2).sum(axis=2)  # (m, ksub)
    cnorm = np.sqrt(norm_sq[np.arange(m)[None, :], codes].sum(axis=1))  # (n,)
    qnorm = np.sqrt((vecs ** 2).sum(axis=1))
    idx = {v: i for i, v in enumerate(ids)}
    rows = []
    for q in query_ids:
        qi = idx[q]
        # lut[s, c] = dot(q_sub(s), cb[s][c])
        lut = np.einsum("scd,sd->sc", cb64,
                        np.stack([vecs[qi, s * subdim:(s + 1) * subdim] for s in range(m)]))
        adc = lut[np.arange(m)[None, :], codes].sum(axis=1)  # (n,)
        denom = qnorm[qi] * cnorm
        with np.errstate(divide="ignore", invalid="ignore"):
            approx = np.where((qnorm[qi] == 0) | (cnorm == 0), 0.0, adc / denom)
        cand_order = sorted((i for i in range(len(ids)) if ids[i] != q),
                            key=lambda i: (-approx[i], ids[i]))
        shortlist = [int(ids[i]) for i in cand_order[:topk * refine]]
        nm = vecs[[idx[n] for n in shortlist]]
        cos = cosine_matrix(vecs[qi][None, :], nm)[0]
        rerank = sorted(range(len(shortlist)), key=lambda i: (-cos[i], shortlist[i]))
        for rank, i in enumerate(rerank[:topk], start=1):
            rows.append((q, rank, shortlist[i]))
    write_topk(rows, "ann_pq_topk_sf001")

    # recall@3 vs exact brute force, for the ann_pq_recall threshold
    cos_all = cosine_matrix(vecs, vecs)
    hits = total = 0
    pq_sets = {}
    for (q, rank, n) in rows:
        pq_sets.setdefault(q, set()).add(n)
    for q in query_ids:
        qi = idx[q]
        sims = cos_all[qi]
        order_q = sorted((i for i in range(len(ids)) if ids[i] != q),
                         key=lambda i: (-sims[i], ids[i]))[:topk]
        truth = {int(ids[i]) for i in order_q}
        total += len(truth)
        hits += len(truth & pq_sets.get(q, set()))
    print(f"ann_pq recall@3 vs brute: {hits}/{total} = {hits/total:.3f}")

    # --- IVF x PQ (nprobe=3, m=8, ksub=16, k=3, refine=8) ---
    # composition of the two blocks above: candidates = the query's nprobe
    # nearest IVF buckets, scored by PQ ADC cosine, shortlist k*refine by
    # (-approx, id), exact-cosine re-rank. Reuses corpus_cid / cen from the
    # IVF block and cb64 / codes / cnorm / qnorm from the PQ block, so the
    # fixture stays an independent float64 replication of both kernels.
    rows = []
    for q in query_ids:
        qi = idx[q]
        sims = cos_c[qi]
        probe = sorted(range(16), key=lambda c: (-sims[c], c))[:3]
        cand_idx = [i for i in range(len(ids))
                    if corpus_cid[i] in probe and ids[i] != q]
        lut = np.einsum("scd,sd->sc", cb64,
                        np.stack([vecs[qi, s * subdim:(s + 1) * subdim] for s in range(m)]))
        adc = lut[np.arange(m)[None, :], codes].sum(axis=1)
        denom = qnorm[qi] * cnorm
        with np.errstate(divide="ignore", invalid="ignore"):
            approx = np.where((qnorm[qi] == 0) | (cnorm == 0), 0.0, adc / denom)
        cand_order = sorted(cand_idx, key=lambda i: (-approx[i], ids[i]))
        shortlist = [int(ids[i]) for i in cand_order[:topk * refine]]
        nm = vecs[[idx[n] for n in shortlist]]
        cos = cosine_matrix(vecs[qi][None, :], nm)[0]
        rerank = sorted(range(len(shortlist)), key=lambda i: (-cos[i], shortlist[i]))
        for rank, i in enumerate(rerank[:topk], start=1):
            rows.append((q, rank, shortlist[i]))
    write_topk(rows, "ann_ivfpq_topk_sf001")

    # --- IVF x PQ after DELETION SCRUB (ann_scrub_topk): the same full-
    # corpus quantizers, but the corpus restricted to vec_id % 5 != 0 —
    # replicates query-after-scrubAnnIndex, where enc/ and vectors/ lose
    # the doomed rows while ivf/ and pq/ stay fixed. Queries keep the full
    # vec_id < 20 set (a scrubbed id may still query; it can never be a
    # neighbor).
    rows = []
    for q in query_ids:
        qi = idx[q]
        sims = cos_c[qi]
        probe = sorted(range(16), key=lambda c: (-sims[c], c))[:3]
        cand_idx = [i for i in range(len(ids))
                    if corpus_cid[i] in probe and ids[i] != q
                    and ids[i] % 5 != 0]
        lut = np.einsum("scd,sd->sc", cb64,
                        np.stack([vecs[qi, s * subdim:(s + 1) * subdim] for s in range(m)]))
        adc = lut[np.arange(m)[None, :], codes].sum(axis=1)
        denom = qnorm[qi] * cnorm
        with np.errstate(divide="ignore", invalid="ignore"):
            approx = np.where((qnorm[qi] == 0) | (cnorm == 0), 0.0, adc / denom)
        cand_order = sorted(cand_idx, key=lambda i: (-approx[i], ids[i]))
        shortlist = [int(ids[i]) for i in cand_order[:topk * refine]]
        nm = vecs[[idx[n] for n in shortlist]]
        cos = cosine_matrix(vecs[qi][None, :], nm)[0]
        rerank = sorted(range(len(shortlist)), key=lambda i: (-cos[i], shortlist[i]))
        for rank, i in enumerate(rerank[:topk], start=1):
            rows.append((q, rank, shortlist[i]))
    write_topk(rows, "ann_scrub_topk_sf001")

    # recall@3 vs brute for the composed path (diagnostic print; the gate
    # hash-compares the fixture itself)
    ivfpq_sets = {}
    for (q, rank, n) in rows:
        ivfpq_sets.setdefault(q, set()).add(n)
    hits = total = 0
    for q in query_ids:
        qi = idx[q]
        sims = cos_all[qi]
        order_q = sorted((i for i in range(len(ids)) if ids[i] != q),
                         key=lambda i: (-sims[i], ids[i]))[:topk]
        truth = {int(ids[i]) for i in order_q}
        total += len(truth)
        hits += len(truth & ivfpq_sets.get(q, set()))
    print(f"ann_ivfpq recall@3 vs brute: {hits}/{total} = {hits/total:.3f}")

    # --- residual IVF x PQ (IVFADC proper: codes quantize vec - centroid) ---
    # replicates trainPqResidual + encodeResidual + ivfPqTopK(residual=true):
    # residuals are float32 subtractions against the assigned (cosine-
    # nearest) float32 IVF centroid; PQ trains on the residuals with the
    # same deterministic Lloyd's; cnorm is the exact norm of the float32
    # reconstruction centroid + decode(codes); the ADC score adds the
    # per-(query, bucket) dot(q, centroid) term.
    res32 = vecs32 - centroids[corpus_cid]  # float32 arithmetic, like zip_with
    res64 = res32.astype(np.float64)
    rseeds = res32[order[:ksub]]
    rcb = np.stack([rseeds[:, s * subdim:(s + 1) * subdim] for s in range(m)])
    rsub64 = np.stack([res64[:, s * subdim:(s + 1) * subdim] for s in range(m)])
    for _ in range(3):
        nxt = rcb.copy()
        for s in range(m):
            d = ((rsub64[s][:, None, :] - rcb[s].astype(np.float64)[None, :, :]) ** 2).sum(axis=2)
            assign = np.argmin(d, axis=1)
            for c in range(ksub):
                members = rsub64[s][assign == c]
                if len(members):
                    nxt[s][c] = members.mean(axis=0).astype(np.float32)
        rcb = nxt
    rcb64 = rcb.astype(np.float64)
    codes_r = np.empty((len(ids), m), dtype=np.int64)
    for s in range(m):
        d = ((rsub64[s][:, None, :] - rcb64[s][None, :, :]) ** 2).sum(axis=2)
        codes_r[:, s] = np.argmin(d, axis=1)
    # float32 reconstruction = centroid + decoded residual, exact norm in f64
    decode32 = np.concatenate(
        [rcb[s][codes_r[:, s]] for s in range(m)], axis=1)  # (n, dim) float32
    recon32 = centroids[corpus_cid] + decode32  # float32 add, like zip_with
    cnorm_r = np.sqrt((recon32.astype(np.float64) ** 2).sum(axis=1))
    rows = []
    for q in query_ids:
        qi = idx[q]
        sims = cos_c[qi]
        probe = sorted(range(16), key=lambda c: (-sims[c], c))[:3]
        qc = {c: float(np.dot(vecs[qi], cen[c])) for c in probe}
        lut = np.einsum("scd,sd->sc", rcb64,
                        np.stack([vecs[qi, s * subdim:(s + 1) * subdim] for s in range(m)]))
        adc = lut[np.arange(m)[None, :], codes_r].sum(axis=1)
        cand_idx = [i for i in range(len(ids))
                    if corpus_cid[i] in probe and ids[i] != q]
        approx = {}
        for i in cand_idx:
            if qnorm[qi] == 0 or cnorm_r[i] == 0:
                approx[i] = 0.0
            else:
                approx[i] = (qc[int(corpus_cid[i])] + adc[i]) / (qnorm[qi] * cnorm_r[i])
        cand_order = sorted(cand_idx, key=lambda i: (-approx[i], ids[i]))
        shortlist = [int(ids[i]) for i in cand_order[:topk * refine]]
        nm = vecs[[idx[n] for n in shortlist]]
        cos = cosine_matrix(vecs[qi][None, :], nm)[0]
        rerank = sorted(range(len(shortlist)), key=lambda i: (-cos[i], shortlist[i]))
        for rank, i in enumerate(rerank[:topk], start=1):
            rows.append((q, rank, shortlist[i]))
    write_topk(rows, "ann_ivfpq_residual_topk_sf001")

    rres_sets = {}
    for (q, rank, n) in rows:
        rres_sets.setdefault(q, set()).add(n)
    hits = total = 0
    for q in query_ids:
        qi = idx[q]
        sims = cos_all[qi]
        order_q = sorted((i for i in range(len(ids)) if ids[i] != q),
                         key=lambda i: (-sims[i], ids[i]))[:topk]
        truth = {int(ids[i]) for i in order_q}
        total += len(truth)
        hits += len(truth & rres_sets.get(q, set()))
    print(f"ann_ivfpq_residual recall@3 vs brute: {hits}/{total} = {hits/total:.3f}")


# ---------------------------------------------------------------------------
# Mojibake repair: an independent python replication of the fixMojibake
# kernel — explicit cp1252 inverse table (the five undefined bytes 0x81
# 0x8D 0x8F 0x90 0x9D do NOT map), strict UTF-8 re-decode, fixpoint <= 4
# passes, whole-string-or-nothing. The fixture plants the hazard classes
# and corrupts every real document's text the way the wild does
# (utf8-encode -> cp1252-mis-decode), expecting exact recovery.
# ---------------------------------------------------------------------------
def make_mojibake_fixture():
    CP1252_SPECIALS = {
        0x20AC: 0x80, 0x201A: 0x82, 0x0192: 0x83, 0x201E: 0x84, 0x2026: 0x85,
        0x2020: 0x86, 0x2021: 0x87, 0x02C6: 0x88, 0x2030: 0x89, 0x0160: 0x8A,
        0x2039: 0x8B, 0x0152: 0x8C, 0x017D: 0x8E, 0x2018: 0x91, 0x2019: 0x92,
        0x201C: 0x93, 0x201D: 0x94, 0x2022: 0x95, 0x2013: 0x96, 0x2014: 0x97,
        0x02DC: 0x98, 0x2122: 0x99, 0x0161: 0x9A, 0x203A: 0x9B, 0x0153: 0x9C,
        0x017E: 0x9E, 0x0178: 0x9F,
    }

    def cp1252_byte(ch):
        cp = ord(ch)
        if cp < 0x80:
            return cp
        if 0xA0 <= cp <= 0xFF:
            return cp
        return CP1252_SPECIALS.get(cp, -1)

    def fix_once(s):
        if all(ord(c) < 0x80 for c in s):
            return None
        bs = bytearray()
        for c in s:
            b = cp1252_byte(c)
            if b < 0:
                return None
            bs.append(b)
        try:
            return bytes(bs).decode("utf-8", "strict")
        except UnicodeDecodeError:
            return None

    def fix(s):
        for _ in range(4):
            nxt = fix_once(s)
            if nxt is None or nxt == s:
                break
            s = nxt
        return s

    # the corruption itself (what a cp1252 mis-decode of utf-8 bytes does);
    # raises if any utf-8 byte lands on an undefined cp1252 byte, so the
    # planted suffix avoids such characters
    def corrupt(s):
        return s.encode("utf-8").decode("cp1252")

    # NOTE: U+201D (right double quote) is excluded from every corrupt()
    # input ON PURPOSE: its UTF-8 tail byte 0x9D is one of the five
    # cp1252-undefined bytes, so a strict cp1252 mis-decode of it cannot
    # have happened upstream — our inverse model is exactly as strict.
    suffix = " café — ‘naïve’ résumé… €9"
    planted = [
        "plain ascii stays plain ascii",          # unchanged fast path
        corrupt("single corruption: café — “q’"),  # the classic Ã©/â€œ case
        corrupt(corrupt("double trouble: café…")),  # fixpoint repairs twice
        "clean text stays: café — “naïve”",        # e9 alone != valid utf-8
        "mixed clean é with mojibake Ã© stays",    # whole-string conservatism
        "unmappable 世界 plus Ã© stays",           # cp1252-unencodable char
        "\u00c2\u00a0",                  # Â+nbsp -> one nbsp (C2 A0)
        corrupt("quotes ‘a’ “b bullets • dash – em — ellipsis …"),
        corrupt("euro € trademark ™ oe œ scaron š"),
    ]
    docs = pq.read_table(f"{SF}/documents.parquet",
                         columns=["doc_id", "text"]).to_pandas()
    ids, corrupted, fixed = [], [], []
    for i, p in enumerate(planted):
        ids.append(int(-(i + 1)))
        corrupted.append(p)
        fixed.append(fix(p))
    # "—" cannot be DOUBLY mis-decoded (its first corruption contains ”,
    # see the note above), so the double-corruption rows use a dash-free
    # suffix; every other suffix char survives two strict round trips
    suffix_double = suffix.replace(" — ", " – ")
    for doc_id, text in zip(docs.doc_id, docs.text):
        double = doc_id % 3 == 0
        t = (text or "") + (suffix_double if double else suffix)
        c = corrupt(corrupt(t)) if double else corrupt(t)
        ids.append(int(doc_id))
        corrupted.append(c)
        fixed.append(fix(c))
        assert fixed[-1] == t, f"doc {doc_id}: repair did not invert corruption"
    table = pa.table({
        "moji_id": pa.array(ids, pa.int64()),
        "corrupted": pa.array(corrupted, pa.string()),
        "fixed_text": pa.array(fixed, pa.string()),
    })
    pq.write_table(table, f"{OUT}/mojibake_sf001.parquet")
    print(f"mojibake_sf001.parquet: {len(ids)} rows")


# ---------------------------------------------------------------------------
# Line-break dehyphenation: independent byte-level replication of
# VectorKernels.dehyphenate — ASCII letter, '-', [ \t\r]*, '\n', [ \t]*,
# lowercase ASCII letter => drop the '-' + whitespace span and continue the
# scan AT the joining letter (chained breaks repair in one pass); all other
# hyphens (uppercase/digit continuation, '--', mid-line) are preserved.
# ---------------------------------------------------------------------------
def make_dehyphenate_fixture():
    def dehyph(s):
        b = s.encode("utf-8")
        out = bytearray()
        i = 0
        while i < len(b):
            c = b[i]
            joined = False
            if c == ord("-") and out and chr(out[-1]).isascii() and chr(out[-1]).isalpha():
                j = i + 1
                while j < len(b) and b[j] in (0x20, 0x09, 0x0D):
                    j += 1
                if j < len(b) and b[j] == 0x0A:
                    j += 1
                    while j < len(b) and b[j] in (0x20, 0x09):
                        j += 1
                    if j < len(b) and ord("a") <= b[j] <= ord("z"):
                        i = j
                        joined = True
            if not joined:
                out.append(c)
                i += 1
        return bytes(out).decode("utf-8")

    planted = [
        "plain text no breaks",
        "exam-\nple",                       # the canonical break
        "exam- \r\n  ple chained x-\ny-\nz",  # CRLF + indent + chained
        "stay-- \nput double dash",          # '--' preserved ('-' before '-')
        "New-\nYork uppercase preserved",    # capitalized continuation
        "v1-\n2 digit continuation stays",
        "trailing hyphen-\n",                # nothing after the newline
        "mid-line hy-phen stays",
        "9-\nlives digit before hyphen stays",
        "café-\nlatte stays: é is not an ASCII letter",  # multibyte guard
    ]
    docs = pq.read_table(f"{SF}/documents.parquet",
                         columns=["doc_id", "text"]).to_pandas()
    ids, broken, fixed = [], [], []
    for i, p in enumerate(planted):
        ids.append(int(-(i + 1)))
        broken.append(p)
        fixed.append(dehyph(p))
    suffix = "\nhyphen-\nated tail exam- \n  ple inter-\nnal Non-\nBreak v2-\n3 end"
    for doc_id, text in zip(docs.doc_id, docs.text):
        t = (text or "") + suffix
        ids.append(int(doc_id))
        broken.append(t)
        fixed.append(dehyph(t))
    table = pa.table({
        "hy_id": pa.array(ids, pa.int64()),
        "broken": pa.array(broken, pa.string()),
        "fixed_text": pa.array(fixed, pa.string()),
    })
    pq.write_table(table, f"{OUT}/dehyphenate_sf001.parquet")
    print(f"dehyphenate_sf001.parquet: {len(ids)} rows")


# ---------------------------------------------------------------------------
# Content-defined chunking: an independent python replication of the
# CdcKernels pipeline — splitmix64 Gear table, rolling (h<<1)+G[b] boundary
# rule (cut when len>=min and (h & mask)==0, or at max), per-chunk FNV-1a 64
# ids. Payloads are doc texts plus a planted shared block on every 3rd doc,
# so chunk-level dedup sees mass that whole-payload dedup cannot.
# ---------------------------------------------------------------------------
def make_cdc_fixture():
    M = (1 << 64) - 1

    def splitmix64(x):
        z = (x + 0x9E3779B97F4A7C15) & M
        z = ((z ^ (z >> 30)) * 0xBF58476D1CE4E5B9) & M
        z = ((z ^ (z >> 27)) * 0x94D049BB133111EB) & M
        return z ^ (z >> 31)

    GEAR = [splitmix64(i + 1) for i in range(256)]

    def fnv1a(b):
        h = 0xcbf29ce484222325
        for x in b:
            h ^= x
            h = (h * 0x100000001B3) & M
        return h

    def chunks(b, avg_bits, min_size, max_size):
        mask = (1 << avg_bits) - 1
        hs, ss = [], []
        start, h = 0, 0
        for i, x in enumerate(b):
            h = ((h << 1) + GEAR[x]) & M
            ln = i - start + 1
            if (ln >= min_size and (h & mask) == 0) or ln == max_size:
                hs.append(fnv1a(b[start:i + 1]))
                ss.append(ln)
                start, h = i + 1, 0
        if start < len(b):
            hs.append(fnv1a(b[start:]))
            ss.append(len(b) - start)
        return hs, ss

    def signed(h):
        return h - (1 << 64) if h >= (1 << 63) else h

    docs = pq.read_table(f"{SF}/documents.parquet",
                         columns=["doc_id", "text"]).to_pandas()
    shared = b"SHARED-BOILERPLATE-BLOCK " * 10  # 250 bytes of common mass
    ids, payloads, hss, sss = [], [], [], []
    for doc_id, text in zip(docs.doc_id, docs.text):
        p = (text or "").encode("utf-8")
        if doc_id % 3 == 0:
            p = p + shared
        hs, ss = chunks(p, 5, 16, 128)
        ids.append(int(doc_id))
        payloads.append(p)
        hss.append([signed(h) for h in hs])
        sss.append(ss)
    # planted edges: empty payload (zero chunks) and a sub-min-size one
    for extra_id, p in [(-1, b""), (-2, b"tiny")]:
        hs, ss = chunks(p, 5, 16, 128)
        ids.append(extra_id)
        payloads.append(p)
        hss.append([signed(h) for h in hs])
        sss.append(ss)
    table = pa.table({
        "pay_id": pa.array(ids, pa.int64()),
        "payload": pa.array(payloads, pa.binary()),
        "hashes": pa.array(hss, pa.list_(pa.int64())),
        "sizes": pa.array(sss, pa.list_(pa.int32())),
    })
    pq.write_table(table, f"{OUT}/cdc_sf001.parquet")
    n_chunks = sum(len(h) for h in hss)
    n_distinct = len({h for hs in hss for h in hs})
    print(f"cdc_sf001.parquet: {len(ids)} rows, {n_chunks} chunks, "
          f"{n_distinct} distinct")


def make_mask_fixture():
    # Independent replication of AcAutomaton.maskAll's documented contract:
    # collect EVERY occurrence of every pattern over UTF-8 BYTES (python's
    # bytes.find with step-1 restart sees overlapping occurrences, same as
    # the automaton), order (start asc, length desc), greedily keep
    # non-overlapping, splice the mask bytes in. Pattern list must match
    # SparkEntry.MaskGatePatterns EXACTLY.
    PATTERNS = ["she", "he", "hers", "can", "scan", "café",
                "lorem ipsum", "click here", "subscribe now"]
    MASK = "[REDACTED]"

    def mask(text):
        b = text.encode("utf-8")
        mb = MASK.encode("utf-8")
        occ = []
        for p in PATTERNS:
            pb = p.encode("utf-8")
            start = b.find(pb)
            while start != -1:
                occ.append((start, -len(pb)))
                start = b.find(pb, start + 1)
        occ.sort()
        out = bytearray()
        cur = 0
        for start, neg in occ:
            ln = -neg
            if start >= cur:
                out += b[cur:start]
                out += mb
                cur = start + ln
        out += b[cur:]
        return out.decode("utf-8")

    planted = [
        "she sells seashells",            # 'she' beats nested 'he'; 2nd hit inside 'seashells'
        "hershey",                        # 'hers' (longest at 0) then 'he' at 4
        "a scan can be scanned",          # 'scan' beats its nested 'can'; standalone 'can' masked
        "cafe café cafés",                # multibyte pattern, ascii lookalike untouched
        "click here to subscribe now and subscribe later",  # phrase + prefix-only miss
        "he",                             # whole-string match
        "shehe",                          # adjacent: 'she' then 'he'
        "nothing to see",                 # no hits at all (identity)
        "lorem ipsumlorem ipsum",         # back-to-back phrase hits
    ]
    docs = pq.read_table(f"{SF}/documents.parquet",
                         columns=["doc_id", "text"]).to_pandas()
    ids, texts, masked = [], [], []
    for i, p in enumerate(planted):
        ids.append(int(-(i + 1)))
        texts.append(p)
        masked.append(mask(p))
    for doc_id, text in zip(docs.doc_id, docs.text):
        t = (text or "") + " — lorem ipsum café; click here, subscribe now"
        ids.append(int(doc_id))
        texts.append(t)
        masked.append(mask(t))
    table = pa.table({
        "mask_id": pa.array(ids, pa.int64()),
        "text": pa.array(texts, pa.string()),
        "masked_text": pa.array(masked, pa.string()),
    })
    pq.write_table(table, f"{OUT}/mask_sf001.parquet")
    print(f"mask_sf001.parquet: {len(ids)} rows")


def make_jsonl_fixture():
    """JSONL ingest fixture: one line per sf document (doc_id, lang,
    n_chars); every 10th line truncated mid-object plus two planted garbage
    lines — ONLY syntax-level corruption, so Spark's PERMISSIVE corrupt set
    and DuckDB's json_valid() agree exactly (type-mismatch flagging is
    sbt-pinned instead, where the engines' notions differ)."""
    import json
    docs = pq.read_table(f"{SF}/documents.parquet",
                         columns=["doc_id", "lang", "n_chars"]).to_pandas()
    lines = []
    for d, l, n in zip(docs.doc_id, docs.lang, docs.n_chars):
        line = json.dumps({"doc_id": int(d), "lang": str(l),
                           "n_chars": int(n)}, separators=(", ", ": "))
        lines.append(line[:-2] if int(d) % 10 == 0 else line)
    lines.append("garbage line one")
    lines.append('{"doc_id": oops}')
    with open(f"{OUT}/docs_sf001.jsonl", "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"docs_sf001.jsonl: {len(lines)} lines")


def make_csv_fixture():
    """CSV ingest fixture: doc_id,lang,n_chars per document; every 10th
    line drops its trailing field — ARITY-only corruption, where Spark's
    PERMISSIVE from_csv and DuckDB's read_csv(ignore_errors) provably
    agree (type-mismatch semantics, where engines differ, are sbt-pinned)."""
    docs = pq.read_table(f"{SF}/documents.parquet",
                         columns=["doc_id", "lang", "n_chars"]).to_pandas()
    lines = []
    for d, l, n in zip(docs.doc_id, docs.lang, docs.n_chars):
        lines.append(f"{int(d)},{l}" if int(d) % 10 == 0
                     else f"{int(d)},{l},{int(n)}")
    with open(f"{OUT}/docs_sf001.csv", "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"docs_sf001.csv: {len(lines)} lines")


def make_wordpiece_fixture():
    """Independent replication of graft.text.WordPiece train + encode:
    word count -> substring scoring (every occurrence, word-initial as-is,
    interior ##-prefixed, <= max_piece_len chars) -> vocab = all single-char
    pieces + top (vocab_size - base) by (score desc, piece asc) -> greedy
    longest-match-first encode. Integer arithmetic end to end."""
    import re
    import string
    from collections import Counter

    VOCAB_SIZE = 300
    MAX_PIECE_LEN = 10
    ascii_lower = str.maketrans(string.ascii_uppercase, string.ascii_lowercase)

    def words_of(t):
        return re.findall(r"[a-z0-9]+", (t or "").translate(ascii_lower))

    docs = pq.read_table(f"{SF}/documents.parquet",
                         columns=["doc_id", "text"]).to_pandas()
    # the datagen corpus has ~31 distinct words — plant doc_id-derived
    # words LONGER than max_piece_len so multi-piece segmentation (and the
    # greedy-scan length bound) is genuinely exercised; same suffix on the
    # Spark side
    aug = [(int(d), (t or "") + f" frag{int(d)}mentation inter{int(d)}ation")
           for d, t in zip(docs.doc_id, docs.text)]
    wc = Counter()
    for _, t in aug:
        wc.update(words_of(t))
    items = sorted(wc.items(), key=lambda x: (-x[1], x[0]))[:1 << 20]

    score = Counter()
    for w, c in items:
        for i in range(len(w)):
            for j in range(i + 1, min(len(w), i + MAX_PIECE_LEN) + 1):
                piece = w[i:j] if i == 0 else "##" + w[i:j]
                score[piece] += c
    base = [p for p in score
            if (len(p) - 2 if p.startswith("##") else len(p)) == 1]
    rest = [(p, s) for p, s in score.items() if p not in set(base)]
    top = [p for p, _ in sorted(rest, key=lambda kv: (-kv[1], kv[0]))
           [:VOCAB_SIZE - len(base)]]
    vocab = set(base) | set(top)
    max_len = max((len(p) - 2 if p.startswith("##") else len(p))
                  for p in vocab)

    memo = {}

    def encode_word(w):
        if w in memo:
            return memo[w]
        out, i = [], 0
        while i < len(w):
            hit = None
            for j in range(min(len(w), i + max_len), i, -1):
                cand = w[i:j] if i == 0 else "##" + w[i:j]
                if cand in vocab:
                    hit = cand
                    break
            if hit is None:
                out = ["[UNK]"]
                break
            out.append(hit)
            i += (len(hit) - 2 if hit.startswith("##") else len(hit))
        memo[w] = out
        return out

    ids, counts, texts = [], [], []
    for doc_id, t in aug:
        toks = [s for w in words_of(t) for s in encode_word(w)]
        ids.append(doc_id)
        counts.append(len(toks))
        texts.append(" ".join(toks))
    table = pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "n_wp_tokens": pa.array(counts, pa.int64()),
        "wp_text": pa.array(texts, pa.string()),
    })
    pq.write_table(table, f"{OUT}/wordpiece_tokens_sf001.parquet")
    print(f"wordpiece_tokens_sf001.parquet: {len(ids)} rows, "
          f"vocab {len(vocab)}")


def make_unigram_fixture():
    """Independent replication of graft.text.Unigram train + encode: word
    count -> substring pseudo-counts -> seed vocab (all single chars + top
    seed_size-chars by (count desc, piece asc)) -> hard-EM (Viterbi counts
    under exact fixed-point log2 scores) -> final vocab + scores ->
    Viterbi encode. Integer arithmetic end to end (log2fp is exact
    shift-and-square on python ints), so this must match the Scala side
    bit-for-bit."""
    import re
    import string
    from collections import Counter

    VOCAB_SIZE = 300
    MAX_PIECE_LEN = 10
    SEED_SIZE = 4096
    EM_ITERS = 2
    UNK_CHAR = -(1 << 40)
    SCORE_FLOOR = -(1 << 62)  # saturating-add floor, part of the replay spec
    ascii_lower = str.maketrans(string.ascii_uppercase, string.ascii_lowercase)

    def words_of(t):
        return re.findall(r"[a-z0-9]+", (t or "").translate(ascii_lower))

    def log2fp(c, frac_bits=16):
        assert c >= 1
        ip = c.bit_length() - 1
        result = ip << frac_bits
        mant = int(c)
        shift = ip
        for bit in range(frac_bits - 1, -1, -1):
            mant *= mant
            shift *= 2
            if mant >= (1 << (shift + 1)):
                result |= 1 << bit
                shift += 1
            excess = mant.bit_length() - 64
            if excess > 0:
                mant >>= excess
                shift -= excess
        return result

    def viterbi(w, score, max_piece_len):
        n = len(w)
        best = [None] * (n + 1)
        back = [0] * (n + 1)
        best[0] = 0
        for end in range(1, n + 1):
            for start in range(max(0, end - max_piece_len), end):
                if best[start] is None:
                    continue
                piece = w[start:end]
                s = score.get(piece)
                if s is None and end - start == 1:
                    s = UNK_CHAR
                if s is None:
                    continue
                cand = max(best[start] + s, SCORE_FLOOR)
                if best[end] is None or cand > best[end]:
                    best[end] = cand
                    back[end] = start
        out, pos = [], n
        while pos > 0:
            out.append(w[back[pos]:pos])
            pos = back[pos]
        return out[::-1]

    docs = pq.read_table(f"{SF}/documents.parquet",
                         columns=["doc_id", "text"]).to_pandas()
    aug = [(int(d), (t or "") + f" frag{int(d)}mentation inter{int(d)}ation")
           for d, t in zip(docs.doc_id, docs.text)]
    wc = Counter()
    for _, t in aug:
        wc.update(words_of(t))
    items = sorted(wc.items(), key=lambda x: (-x[1], x[0]))[:1 << 20]

    seed = Counter()
    for w, c in items:
        L = len(w)
        for i in range(L):
            for j in range(i + 1, min(L, i + MAX_PIECE_LEN) + 1):
                seed[w[i:j]] += c
    chars = sorted(p for p in seed if len(p) == 1)
    seed_multi = sorted(((p, s) for p, s in seed.items() if len(p) > 1),
                        key=lambda kv: (-kv[1], kv[0]))[:SEED_SIZE - len(chars)]
    counts = {ch: seed[ch] for ch in chars}
    counts.update({p: s for p, s in seed_multi})

    def scores_of(cts):
        total = sum(max(v, 1) for v in cts.values())
        lt = log2fp(max(total, 1))
        return {p: log2fp(max(c, 1)) - lt for p, c in cts.items()}

    for _ in range(EM_ITERS):
        sc = scores_of(counts)
        nxt = Counter()
        for w, c in items:
            for p in viterbi(w, sc, MAX_PIECE_LEN):
                nxt[p] += c
        pruned = {ch: nxt.get(ch, 0) for ch in chars}
        pruned.update({p: c for p, c in nxt.items() if len(p) > 1 and c > 0})
        counts = pruned

    final_multi = sorted(((p, c) for p, c in counts.items() if len(p) > 1),
                         key=lambda kv: (-kv[1], kv[0]))[:VOCAB_SIZE - len(chars)]
    final_counts = {ch: counts.get(ch, 0) for ch in chars}
    final_counts.update({p: c for p, c in final_multi})
    final_scores = scores_of(final_counts)
    max_len = max(len(p) for p in final_scores)

    memo = {}

    def encode_word(w):
        if w not in memo:
            memo[w] = viterbi(w, final_scores, max_len)
        return memo[w]

    ids, counts_out, texts = [], [], []
    for doc_id, t in aug:
        toks = [s for w in words_of(t) for s in encode_word(w)]
        ids.append(doc_id)
        counts_out.append(len(toks))
        texts.append(" ".join(toks))
    table = pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "n_ug_tokens": pa.array(counts_out, pa.int64()),
        "ug_text": pa.array(texts, pa.string()),
    })
    pq.write_table(table, f"{OUT}/unigram_tokens_sf001.parquet")
    print(f"unigram_tokens_sf001.parquet: {len(ids)} rows, "
          f"vocab {len(final_scores)}")


# ---------------------------------------------------------------------------
# Luhn-validated card redaction: an independent byte-level replication of
# VectorKernels.redactValidCards / validCardCount — maximal digit runs with
# single ' '/'-' group separators, redacted only when 13..19 digits pass the
# ISO/IEC 7812 mod-10 checksum.
# ---------------------------------------------------------------------------
def make_luhn_fixture():
    def luhn_ok(d):
        s, second = 0, False
        for v in reversed(d):
            if second:
                v *= 2
                if v > 9:
                    v -= 9
            s += v
            second = not second
        return s % 10 == 0

    def redact_count(text, token="[CARD]"):
        b = text.encode("utf-8")
        tok = token.encode("utf-8")
        out = bytearray()
        i, cnt = 0, 0

        def is_d(c):
            return 0x30 <= c <= 0x39

        while i < len(b):
            if is_d(b[i]):
                digits, k = [], i
                while k < len(b) and is_d(b[k]):
                    digits.append(b[k] - 0x30)
                    k += 1
                while k + 1 < len(b) and b[k] in (0x20, 0x2D) and is_d(b[k + 1]):
                    k += 1
                    while k < len(b) and is_d(b[k]):
                        digits.append(b[k] - 0x30)
                        k += 1
                if 13 <= len(digits) <= 19 and luhn_ok(digits):
                    out += tok
                    cnt += 1
                else:
                    out += b[i:k]
                i = k
            else:
                out.append(b[i])
                i += 1
        return bytes(out).decode("utf-8"), cnt

    def with_check(body):  # append the Luhn check digit to a digit string
        d = [int(c) for c in body]
        for c in range(10):
            if luhn_ok(d + [c]):
                return body + str(c)
        raise AssertionError("unreachable")

    v16 = with_check("411111111111111")         # classic Visa test PAN
    v13 = with_check("401288888888")            # 13-digit legacy Visa length
    v19 = with_check("621483012345678901")      # 19-digit UnionPay length
    bad16 = v16[:-1] + str((int(v16[-1]) + 1) % 10)  # checksum off by one
    grp = " ".join([v16[j:j + 4] for j in range(0, 16, 4)])
    dashed = "-".join([v16[j:j + 4] for j in range(0, 16, 4)])
    planted = [
        "no digits here",
        f"pay with {v16} today",                  # unbroken valid
        f"grouped {grp} form",                     # single-space groups
        f"dashed {dashed} form",                   # single-dash groups
        f"mixed {v16[:4]} {v16[4:8]}-{v16[8:12]} {v16[12:]} separators",
        f"bad checksum {bad16} stays",
        f"short 123456789012 stays",               # 12 digits: too short
        f"long {v16}0000 stays",                   # 20 digits: too long
        f"thirteen {v13} and nineteen {v19}",      # both lengths valid
        f"double  gap {v16[:8]}  {v16[8:]} splits the run",
        f"letter-adjacent {v16}x still a full run",
        "timestamp 20260816053000 is not a card",
        f"two cards {v16} and {dashed} count twice",
        f"trailing sep {v16}- keeps the dash",
    ]
    docs = pq.read_table(f"{SF}/documents.parquet",
                         columns=["doc_id", "text"]).to_pandas()
    ids, raw, red, ncards = [], [], [], []
    for i, p in enumerate(planted):
        ids.append(int(-(i + 1)))
        r, c = redact_count(p)
        raw.append(p); red.append(r); ncards.append(c)
    suffix = (f"\ncard {grp} order 987654321 ref {bad16} "
              f"acct {v13} ts 20260816053000")
    for doc_id, text in zip(docs.doc_id, docs.text):
        t = (text or "") + suffix
        r, c = redact_count(t)
        ids.append(int(doc_id))
        raw.append(t); red.append(r); ncards.append(c)
    table = pa.table({
        "card_id": pa.array(ids, pa.int64()),
        "raw": pa.array(raw, pa.string()),
        "redacted": pa.array(red, pa.string()),
        "n_cards": pa.array(ncards, pa.int64()),
    })
    pq.write_table(table, f"{OUT}/luhn_sf001.parquet")
    print(f"luhn_sf001.parquet: {len(ids)} rows, "
          f"{sum(1 for c in ncards if c)} rows with cards")


# ---------------------------------------------------------------------------
# Record linkage: an independent python replication of VectorKernels.soundex4
# (blocking) + jaroWinklerFp (exact fixed-point verify) + the Linkage block
# join — input names AND expected matched pairs both live in the fixtures.
# ---------------------------------------------------------------------------
def make_linkage_fixture():
    SDX = {**{c: 1 for c in "BFPV"}, **{c: 2 for c in "CGJKQSXZ"},
           **{c: 3 for c in "DT"}, "L": 4, "M": 5, "N": 5, "R": 6,
           "H": 7, "W": 7}

    def soundex4(s):
        letters = [c.upper() for c in s if c.isascii() and c.isalpha()]
        if not letters:
            return "0000"
        out = [letters[0]]
        last = SDX.get(letters[0], 0)
        for c in letters[1:]:
            if len(out) >= 4:
                break
            code = SDX.get(c, 0)
            if code == 0:
                last = 0
            elif code != 7:
                if code != last:
                    out.append(str(code))
                last = code
        return "".join(out).ljust(4, "0")

    def jw_fp(a, b):
        s1, s2 = [ord(c) for c in a][:512], [ord(c) for c in b][:512]
        l1, l2 = len(s1), len(s2)
        if l1 == 0 and l2 == 0:
            return 1 << 20
        if l1 == 0 or l2 == 0:
            return 0
        w = max(0, max(l1, l2) // 2 - 1)
        used = [False] * l2
        m1 = []
        for i, c in enumerate(s1):
            for j in range(max(0, i - w), min(l2 - 1, i + w) + 1):
                if not used[j] and s2[j] == c:
                    used[j] = True
                    m1.append(c)
                    break
        m = len(m1)
        if m == 0:
            return 0
        m2 = [s2[j] for j in range(l2) if used[j]]
        t2 = sum(1 for x, y in zip(m1, m2) if x != y)
        jaro_num = 2 * m * m * l2 + 2 * m * m * l1 + (2 * m - t2) * l1 * l2
        jaro_den = 6 * l1 * l2 * m
        ell = 0
        while ell < 4 and ell < l1 and ell < l2 and s1[ell] == s2[ell]:
            ell += 1
        jw_num = (10 - ell) * jaro_num + ell * jaro_den
        return (jw_num << 20) // (10 * jaro_den)

    hand = ["Jonathan Smith", "Katherine Bailey", "Gregory Watson",
            "Robert Miller", "Margaret Chen", "William Harper",
            "Elizabeth Turner", "Christopher Lane", "Veronica Steele",
            "Frederick Moss", "Dolores Winter", "Maximilian Frost",
            "Jon Smith", "Rupert Miller", "Benedict Clarke",
            "Anastasia Volkov", "Theodore Grant", "Penelope Marsh"]
    left, right = [], []          # (rec_id, name)
    for i, name in enumerate(hand):
        left.append((i, name))
        if i % 2 == 0:            # drop one interior char: near-dup variant
            pos = 1 + (i % (len(name) - 2))
            right.append((10000 + i, name[:pos] + name[pos + 1:]))
        if i % 3 == 0:            # swap two interior chars
            p = 2 + (i % (len(name) - 3))
            right.append((20000 + i,
                          name[:p] + name[p + 1] + name[p] + name[p + 2:]))
    right += [(30000, "Quincy Abernathy"), (30001, "Xiomara Quintero"),
              (30002, "Jhon Smith"), (30003, "Katherin Baily")]
    # volume: two-token names from the documents table; every third doc
    # contributes a one-char-dropped variant on the right
    docs = pq.read_table(f"{SF}/documents.parquet",
                         columns=["doc_id", "text"]).to_pandas()
    for doc_id, text in zip(docs.doc_id, docs.text):
        toks = [t for t in (text or "").split() if t][:2]
        if len(toks) < 2:
            continue
        name = " ".join(t.capitalize() for t in toks)
        left.append((100000 + int(doc_id), name))
        if doc_id % 3 == 0 and len(name) > 4:
            pos = 1 + (int(doc_id) % (len(name) - 2))
            right.append((200000 + int(doc_id), name[:pos] + name[pos + 1:]))
    # expected pairs: replicate the block join + threshold exactly
    min_fp = int(0.92 * (1 << 20))
    by_blk = {}
    for rid, name in right:
        by_blk.setdefault(soundex4(name), []).append((rid, name))
    pairs = []
    for lid, lname in left:
        for rid, rname in by_blk.get(soundex4(lname), []):
            fp = jw_fp(lname, rname)
            if fp >= min_fp:
                pairs.append((lid, rid, fp))
    rows = ([("L", rid, name) for rid, name in left] +
            [("R", rid, name) for rid, name in right])
    pq.write_table(pa.table({
        "side": pa.array([r[0] for r in rows], pa.string()),
        "rec_id": pa.array([r[1] for r in rows], pa.int64()),
        "name": pa.array([r[2] for r in rows], pa.string()),
    }), f"{OUT}/linkage_input_sf001.parquet")
    pq.write_table(pa.table({
        "id_a": pa.array([p[0] for p in pairs], pa.int64()),
        "id_b": pa.array([p[1] for p in pairs], pa.int64()),
        "score_fp": pa.array([p[2] for p in pairs], pa.int64()),
    }), f"{OUT}/linkage_pairs_sf001.parquet")
    print(f"linkage fixtures: {len(rows)} records, {len(pairs)} expected pairs")


def make_binpack_fixture():
    """Independent replication of graft.text.BinPack.packBins' deterministic
    spec (histogram best-fit bin packing, SPFHP lineage) over the golden
    byte-BPE token counts at capacity 512 -> (doc_id, n_tokens, bin_id,
    slot). Groups of identical bins occupy contiguous id ranges; fills take
    the prefix; lengths iterate descending; best fit = smallest remaining
    >= L, ties earliest-created; no fit opens ceil(c / (cap // L)) bins."""
    CAP = 512
    t = pq.read_table(f"{OUT}/byte_bpe_sf001.parquet").to_pandas()
    rows = [(int(d), int(n)) for d, n in zip(t.doc_id, t.n_byte_tokens)
            if d >= 0 and n > 0]
    assert all(n <= CAP for _, n in rows), "chunk oversized docs first"
    classes = {}
    for d, n in rows:
        classes.setdefault(n, []).append(d)
    for n in classes:
        classes[n].sort()
    groups = []  # [slots, rem, bin_start, count] — all bins in a group identical
    assign = {}
    next_bin = 0
    for L in sorted(classes, reverse=True):
        docs = classes[L]
        rank = 0
        while rank < len(docs):
            c = len(docs) - rank
            best = -1
            for i, g in enumerate(groups):
                if g[1] >= L and (best < 0 or g[1] < groups[best][1]):
                    best = i
            if best >= 0:
                g = groups[best]
                tt = min(c, g[3])
                for k in range(tt):
                    assign[docs[rank + k]] = (g[2] + k, g[0], L)
                if tt == g[3]:
                    g[0] += 1
                    g[1] -= L
                else:
                    groups.append([g[0] + 1, g[1] - L, g[2], tt])
                    g[2] += tt
                    g[3] -= tt
                rank += tt
            else:
                per = CAP // L
                tt = min(c, -(-c // per))
                for k in range(tt):
                    assign[docs[rank + k]] = (next_bin + k, 0, L)
                groups.append([1, CAP - L, next_bin, tt])
                next_bin += tt
                rank += tt
    # validity: per-bin sums within capacity, every doc placed once
    fill = {}
    for d, (b, s, L) in assign.items():
        fill[b] = fill.get(b, 0) + L
    assert len(assign) == len(rows) and all(v <= CAP for v in fill.values())
    assert set(fill) == set(range(next_bin))
    ids = sorted(assign)
    table = pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "n_tokens": pa.array([assign[d][2] for d in ids], pa.int64()),
        "bin_id": pa.array([assign[d][0] for d in ids], pa.int64()),
        "slot": pa.array([assign[d][1] for d in ids], pa.int64()),
    })
    pq.write_table(table, f"{OUT}/binpack_sf001.parquet")
    tot = sum(n for _, n in rows)
    print(f"binpack_sf001.parquet: {len(ids)} docs, {next_bin} bins, "
          f"fill {tot}/{next_bin * CAP} = {tot / (next_bin * CAP):.3f}")


def make_kcenter_fixture():
    """Integer replication of graft.sample.Coreset.kCenterSelect: int8
    per-vector quantization (the embedding_int8_codes spec), exact integer
    squared-L2 on codes, greedy farthest-first from the smallest vec_id,
    ties to the smallest id. Everything integer after the encode, so the
    selection is bit-reproducible."""
    import math
    K = 16
    t = pq.read_table(f"{SF}/embeddings.parquet",
                      columns=["vec_id", "embedding"]).to_pandas()

    def enc(v):
        xs = [float(x) for x in v]
        m = max((abs(x) for x in xs), default=0.0)
        if m == 0.0:
            return [0] * len(xs)
        return [int(max(-127.0, min(127.0, math.floor(x * 127.0 / m + 0.5))))
                for x in xs]

    codes = {int(i): enc(v) for i, v in zip(t.vec_id, t.embedding)}
    nn = {i: sum(c * c for c in cs) for i, cs in codes.items()}

    def d2(a, b):
        return nn[a] + nn[b] - 2 * sum(x * y
                                       for x, y in zip(codes[a], codes[b]))

    sid = min(codes)
    picks = [(1, sid, 0)]
    remaining = set(codes) - {sid}
    mind = {i: d2(i, sid) for i in remaining}
    for r in range(2, K + 1):
        if not remaining:
            break
        best = max(remaining, key=lambda i: (mind[i], -i))
        picks.append((r, best, mind[best]))
        remaining.discard(best)
        del mind[best]
        for i in remaining:
            di = d2(i, best)
            if di < mind[i]:
                mind[i] = di
    table = pa.table({
        "rank": pa.array([p[0] for p in picks], pa.int64()),
        "vec_id": pa.array([p[1] for p in picks], pa.int64()),
        "d2": pa.array([p[2] for p in picks], pa.int64()),
    })
    pq.write_table(table, f"{OUT}/kcenter_sf001.parquet")
    print(f"kcenter_sf001.parquet: {len(picks)} centers, "
          f"radius curve {[p[2] for p in picks[:5]]}...")


if __name__ == "__main__":
    make_images_fixture()
    make_audio_fixture()
    make_video_fixture()
    make_html_fixture()
    make_mojibake_fixture()
    make_dehyphenate_fixture()
    make_cdc_fixture()
    make_bpe_fixture()
    make_byte_bpe_fixture()
    make_chat_bpe_fixture()
    make_wordpiece_fixture()
    make_unigram_fixture()
    make_jsonl_fixture()
    make_csv_fixture()
    make_url_fixture()
    make_deflate_fixture()
    make_mask_fixture()
    make_luhn_fixture()
    make_linkage_fixture()
    make_ann_goldens()
    make_binpack_fixture()
    make_kcenter_fixture()
