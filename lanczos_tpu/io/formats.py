"""BMP / TGA / PNM / GIF decoders (pure NumPy, from the format specs).

Together with the PNG and JPEG modules this covers the practically-used
slice of the reference's stb ingest surface (``stb_image.h`` decodes
JPEG/PNG/BMP/TGA/GIF/PSD/PIC/PNM; PSD and PIC are vanishingly rare and
raise a clear error via :func:`lanczos_tpu.io.decode_image`).

Scope:
- BMP: uncompressed BI_RGB 8 (paletted) / 24 / 32-bit, bottom-up or
  top-down rows.
- TGA: types 1/2 (uncompressed palette/truecolor), 9/10 (RLE), 8/16/24/32
  bpp, origin handling.
- PNM: binary P5 (gray) and P6 (RGB), maxval ≤ 65535.
- GIF: 87a/89a first frame, LZW decode, interlace, global/local palettes,
  transparency → alpha channel.
"""

from __future__ import annotations

import struct

import numpy as np


class FormatError(ValueError):
    pass


# ---------------------------------------------------------------- BMP


def decode_bmp(data: bytes) -> np.ndarray:
    if data[:2] != b"BM":
        raise FormatError("not a BMP")
    (pix_off,) = struct.unpack("<I", data[10:14])
    (hdr_size,) = struct.unpack("<I", data[14:18])
    if hdr_size < 40:
        raise FormatError("BMP core header unsupported")
    w, h = struct.unpack("<ii", data[18:26])
    planes, bpp = struct.unpack("<HH", data[26:30])
    (comp,) = struct.unpack("<I", data[30:34])
    if comp not in (0, 3):  # BI_RGB / BI_BITFIELDS(with default masks)
        raise FormatError(f"BMP compression {comp} unsupported")
    top_down = h < 0
    h = abs(h)
    if bpp == 8:
        (ncol,) = struct.unpack("<I", data[46:50])
        ncol = ncol or 256
        pal = np.frombuffer(
            data[14 + hdr_size : 14 + hdr_size + 4 * ncol], np.uint8
        ).reshape(-1, 4)[:, [2, 1, 0]]  # BGRX -> RGB
        stride = (w + 3) & ~3
        rows = np.frombuffer(data[pix_off : pix_off + stride * h], np.uint8)
        img = pal[rows.reshape(h, stride)[:, :w]]
    elif bpp in (24, 32):
        nb = bpp // 8
        stride = (w * nb + 3) & ~3
        rows = np.frombuffer(data[pix_off : pix_off + stride * h], np.uint8)
        px = rows.reshape(h, stride)[:, : w * nb].reshape(h, w, nb)
        img = px[:, :, [2, 1, 0, 3][: (4 if nb == 4 else 3)]]  # BGR(A)->RGB(A)
    else:
        raise FormatError(f"BMP bpp {bpp} unsupported")
    if not top_down:
        img = img[::-1]
    return np.ascontiguousarray(img)


# ---------------------------------------------------------------- TGA


def decode_tga(data: bytes) -> np.ndarray:
    idlen, cmap_type, imgtype = data[0], data[1], data[2]
    cmap_start, cmap_len = struct.unpack("<HH", data[3:7])
    cmap_bpp = data[7]
    w, h = struct.unpack("<HH", data[12:16])
    bpp, desc = data[16], data[17]
    if imgtype not in (1, 2, 3, 9, 10, 11):
        raise FormatError(f"TGA type {imgtype} unsupported")
    pos = 18 + idlen
    pal = None
    if cmap_type:
        nb = cmap_bpp // 8
        pal_raw = np.frombuffer(
            data[pos : pos + cmap_len * nb], np.uint8
        ).reshape(cmap_len, nb)
        pal = _tga_px_to_rgb(pal_raw, cmap_bpp)
        pos += cmap_len * nb
    nb = max(bpp // 8, 1)
    count = w * h
    if imgtype >= 9:  # RLE
        out = np.empty((count, nb), np.uint8)
        buf = np.frombuffer(data[pos:], np.uint8)
        i = 0
        o = 0
        while o < count:
            hdr = int(buf[i])
            i += 1
            n = (hdr & 0x7F) + 1
            if hdr & 0x80:
                out[o : o + n] = buf[i : i + nb]
                i += nb
            else:
                out[o : o + n] = buf[i : i + n * nb].reshape(n, nb)
                i += n * nb
            o += n
        px = out
    else:
        px = np.frombuffer(data[pos : pos + count * nb], np.uint8).reshape(
            count, nb
        )
    if imgtype in (1, 9):  # palette indices
        if pal is None:
            raise FormatError("paletted TGA without color map")
        img = pal[px[:, 0].astype(np.int32) - cmap_start]
    elif imgtype in (3, 11):  # grayscale
        img = px[:, :1]
    else:
        img = _tga_px_to_rgb(px, bpp)
    img = img.reshape(h, w, -1)
    if not (desc & 0x20):  # bottom-up origin
        img = img[::-1]
    if desc & 0x10:  # right-to-left
        img = img[:, ::-1]
    return np.ascontiguousarray(img)


def _tga_px_to_rgb(px: np.ndarray, bpp: int) -> np.ndarray:
    if bpp == 32:
        return px[:, [2, 1, 0, 3]]
    if bpp == 24:
        return px[:, [2, 1, 0]]
    if bpp in (15, 16):
        v = px[:, 0].astype(np.uint16) | (px[:, 1].astype(np.uint16) << 8)
        r = ((v >> 10) & 31).astype(np.uint8)
        g = ((v >> 5) & 31).astype(np.uint8)
        b = (v & 31).astype(np.uint8)
        scale = lambda c: ((c.astype(np.uint16) * 255 + 15) // 31).astype(np.uint8)
        return np.stack([scale(r), scale(g), scale(b)], -1)
    if bpp == 8:
        return px[:, :1]
    raise FormatError(f"TGA bpp {bpp} unsupported")


# ---------------------------------------------------------------- PNM


def decode_pnm(data: bytes) -> np.ndarray:
    if data[:2] not in (b"P5", b"P6"):
        raise FormatError("only binary PNM (P5/P6) supported")
    nchan = 1 if data[:2] == b"P5" else 3
    # parse header tokens (skipping comments)
    pos = 2
    vals = []
    while len(vals) < 3:
        while pos < len(data) and data[pos : pos + 1].isspace():
            pos += 1
        if data[pos : pos + 1] == b"#":
            while pos < len(data) and data[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(data) and not data[pos : pos + 1].isspace():
            pos += 1
        vals.append(int(data[start:pos]))
    pos += 1  # single whitespace after maxval
    w, h, maxval = vals
    if maxval < 256:
        img = np.frombuffer(data[pos : pos + w * h * nchan], np.uint8)
    else:
        raw = np.frombuffer(data[pos : pos + 2 * w * h * nchan], ">u2")
        img = (raw.astype(np.uint32) * 255 // maxval).astype(np.uint8)
    return img.reshape(h, w, nchan).copy()


# ---------------------------------------------------------------- GIF


def _lzw_decode(data: bytes, min_code_size: int, npixels: int) -> np.ndarray:
    """GIF-flavored LZW: strings kept as (prefix code, tail byte) chains."""
    clear = 1 << min_code_size
    eoi = clear + 1
    out = np.empty(npixels, np.uint8)
    n_out = 0
    prefix = [-1] * 4096
    tail = [0] * 4096
    first = [0] * 4096
    for c in range(clear):
        tail[c] = first[c] = c

    bitpos = 0
    total_bits = len(data) * 8

    def read_code(size):
        nonlocal bitpos
        if bitpos + size > total_bits:
            return eoi
        byte0 = bitpos >> 3
        v = int.from_bytes(data[byte0 : byte0 + 3], "little")
        v = (v >> (bitpos & 7)) & ((1 << size) - 1)
        bitpos += size
        return v

    def expand(c):
        stack = bytearray()
        while c >= 0:
            stack.append(tail[c])
            c = prefix[c]
        stack.reverse()
        return stack

    code_size = min_code_size + 1
    next_code = eoi + 1
    prev = -1
    while n_out < npixels:
        code = read_code(code_size)
        if code == clear:
            code_size = min_code_size + 1
            next_code = eoi + 1
            prev = -1
            continue
        if code == eoi:
            break  # early EOI: truncation check below
        if prev < 0:
            if code >= clear:
                raise FormatError("corrupt LZW stream (bad first code)")
            out[n_out] = first[code]
            n_out += 1
            prev = code
            continue
        if code < next_code:
            seq = expand(code)
            new_tail = seq[0]
        elif code == next_code:  # KwKwK
            seq = expand(prev)
            seq.append(first[prev])
            new_tail = seq[0]
        else:
            raise FormatError("corrupt LZW stream")
        n = min(len(seq), npixels - n_out)
        out[n_out : n_out + n] = np.frombuffer(bytes(seq[:n]), np.uint8)
        n_out += n
        if next_code < 4096:
            prefix[next_code] = prev
            tail[next_code] = new_tail
            first[next_code] = first[prev]
            next_code += 1
            if next_code == (1 << code_size) and code_size < 12:
                code_size += 1
        prev = code
    if n_out < npixels:
        # a truncated stream exhausts the bits (read_code returns a
        # synthetic EOI) — raising beats returning np.empty garbage rows
        raise FormatError(
            f"truncated GIF image data: {n_out}/{npixels} pixels decoded"
        )
    return out


def decode_gif(data: bytes) -> np.ndarray:
    try:
        return _decode_gif(data)
    except (IndexError, struct.error) as e:
        # running off the end of the byte stream mid-structure is a
        # truncated/corrupt file, not an internal error
        raise FormatError(f"truncated GIF: {e}") from e


def _decode_gif(data: bytes) -> np.ndarray:
    if data[:6] not in (b"GIF87a", b"GIF89a"):
        raise FormatError("not a GIF")
    w, h = struct.unpack("<HH", data[6:10])
    flags = data[10]
    pos = 13
    gpal = None
    if flags & 0x80:
        n = 2 << (flags & 7)
        gpal = np.frombuffer(data[pos : pos + 3 * n], np.uint8).reshape(n, 3)
        pos += 3 * n
    transparent = None
    while pos < len(data):
        b0 = data[pos]
        if b0 == 0x21:  # extension
            label = data[pos + 1]
            pos += 2
            if label == 0xF9:  # graphic control
                size = data[pos]
                gflags = data[pos + 1]
                if gflags & 1:
                    transparent = data[pos + 4]
                pos += size + 1
            while data[pos] != 0:  # skip sub-blocks
                pos += data[pos] + 1
            pos += 1
        elif b0 == 0x2C:  # image descriptor
            x0, y0, iw, ih = struct.unpack("<HHHH", data[pos + 1 : pos + 9])
            iflags = data[pos + 9]
            pos += 10
            pal = gpal
            if iflags & 0x80:
                n = 2 << (iflags & 7)
                pal = np.frombuffer(
                    data[pos : pos + 3 * n], np.uint8
                ).reshape(n, 3)
                pos += 3 * n
            if pal is None:
                raise FormatError("GIF image without palette")
            min_code = data[pos]
            pos += 1
            chunks = []
            while data[pos] != 0:
                ln = data[pos]
                chunks.append(data[pos + 1 : pos + 1 + ln])
                pos += ln + 1
            pos += 1
            idx = _lzw_decode(b"".join(chunks), min_code, iw * ih).reshape(
                ih, iw
            )
            if iflags & 0x40:  # interlaced
                de = np.empty_like(idx)
                rows = np.concatenate(
                    [np.arange(0, ih, 8), np.arange(4, ih, 8),
                     np.arange(2, ih, 4), np.arange(1, ih, 2)]
                )
                de[rows] = idx
                idx = de
            rgb = pal[idx]
            if transparent is not None:
                a = np.where(idx == transparent, 0, 255).astype(np.uint8)
                rgb = np.concatenate([rgb, a[..., None]], -1)
            # first frame only; composite into full canvas if offset
            if (x0, y0, iw, ih) != (0, 0, w, h):
                c = rgb.shape[-1]
                canvas = np.zeros((h, w, c), np.uint8)
                canvas[y0 : y0 + ih, x0 : x0 + iw] = rgb
                rgb = canvas
            return np.ascontiguousarray(rgb)
        elif b0 == 0x3B:  # trailer
            break
        else:
            raise FormatError(f"bad GIF block 0x{b0:02X}")
    raise FormatError("GIF contains no image")


# ------------------------------------------------------------- encoders
#
# The write half of the stb surface: the reference vendors
# stb_image_write.h (PNG/BMP/TGA/JPG/HDR) even though its testbench only
# calls stbi_write_png (full_TB.h:172,177).  PNG/JPEG encode live in
# their codec modules; the simple containers live here.


def _norm_img(img: np.ndarray) -> np.ndarray:
    """Normalize to (H, W, C) uint8, C in {1, 3, 4}."""
    img = np.asarray(img)
    if img.dtype != np.uint8:
        raise FormatError(f"expected uint8 pixels, got {img.dtype}")
    if img.ndim == 2:
        img = img[:, :, None]
    if img.ndim != 3 or img.shape[2] not in (1, 3, 4):
        raise FormatError(f"expected (H, W, C<=4) image, got {img.shape}")
    return img


def encode_bmp(img: np.ndarray) -> bytes:
    """Windows BMP, bottom-up: BI_RGB 24-bit (gray/RGB), or 32-bit
    BITMAPV4 + BI_BITFIELDS alpha masks (RGBA — plain 32-bit BI_RGB
    alpha is ignored by most readers)."""
    img = _norm_img(img)
    h, w, c = img.shape
    if c == 1:
        img = np.repeat(img, 3, axis=2)
        c = 3
    nb = 4 if c == 4 else 3
    px = img[::-1, :, [2, 1, 0, 3][:nb]]  # RGB(A) -> BGR(A), bottom-up
    stride = (w * nb + 3) & ~3
    rows = np.zeros((h, stride), np.uint8)
    rows[:, : w * nb] = px.reshape(h, w * nb)
    data = rows.tobytes()
    if nb == 3:
        info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(data),
                           2835, 2835, 0, 0)
    else:  # BITMAPV4HEADER with explicit channel masks
        info = struct.pack(
            "<IiiHHIIiiII" "IIII" "I36xIII",
            108, w, h, 1, 32, 3, len(data), 2835, 2835, 0, 0,
            0x00FF0000, 0x0000FF00, 0x000000FF, 0xFF000000,
            0x73524742, 0, 0, 0,  # LCS 'sRGB'; endpoints/gamma unused
        )
    off = 14 + len(info)
    return (struct.pack("<2sIHHI", b"BM", off + len(data), 0, 0, off)
            + info + data)


def encode_tga(img: np.ndarray) -> bytes:
    """TGA: uncompressed type 3 (gray) or type 2 (BGR/BGRA), top-left origin."""
    img = _norm_img(img)
    h, w, c = img.shape
    if c == 1:
        imgtype, bpp, px = 3, 8, img[:, :, 0]
    else:
        imgtype, bpp = 2, c * 8
        px = img[:, :, [2, 1, 0, 3][:c]]  # RGB(A) -> BGR(A)
    # descriptor bit 5 = top-left origin; bits 0-3 = alpha depth
    desc = 0x20 | (8 if c == 4 else 0)
    hdr = struct.pack("<BBBHHBHHHHBB", 0, 0, imgtype, 0, 0, 0, 0, 0, w, h,
                      bpp, desc)
    return hdr + np.ascontiguousarray(px).tobytes()


def encode_pnm(img: np.ndarray) -> bytes:
    """Binary PNM: P5 (gray) or P6 (RGB); alpha is not representable."""
    img = _norm_img(img)
    h, w, c = img.shape
    if c == 4:
        raise FormatError("PNM cannot carry an alpha channel")
    magic = b"P5" if c == 1 else b"P6"
    return magic + f"\n{w} {h}\n255\n".encode() + img.tobytes()
