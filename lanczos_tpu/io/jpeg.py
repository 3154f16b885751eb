"""Baseline JPEG decoder (from the ITU T.81 spec; native C++ hot loop).

The reference ingests images through its vendored stb codec, which decodes
JPEG among others (``stb_image.h``, used at ``full_TB.h:107``); round-1
shipped PNG only.  This module closes the gap for baseline JPEG:

- Python parses the marker stream (DQT/DHT/SOF0/SOS/DRI) and derives the
  canonical Huffman tables;
- the per-MCU entropy decode + dequant + 8×8 IDCT runs in C++
  (``_native/jpegdec.cpp``) via ctypes — the same split as the PNG codec;
- chroma upsampling uses libjpeg-style triangle ("fancy") interpolation
  and the standard YCbCr→RGB conversion, vectorized in NumPy.

Scope: baseline DCT (SOF0), single interleaved scan, grayscale or YCbCr
(any sampling factors incl. 4:2:0/4:2:2), restart markers.  Progressive
(SOF2) and arithmetic coding raise.
"""

from __future__ import annotations

import ctypes
import struct

import numpy as np

from lanczos_tpu.io._native import native_lib


class JPEGError(ValueError):
    pass


def _triangle_upsample_axis(p: np.ndarray, factor: int, axis: int, size: int):
    """libjpeg-style fancy upsampling along one axis (factor 1 or 2;
    other factors fall back to nearest)."""
    if factor == 1:
        return p
    p = np.moveaxis(p, axis, 0).astype(np.int32)
    if factor == 2:
        up = np.empty((p.shape[0] * 2,) + p.shape[1:], np.int32)
        prev = np.concatenate([p[:1], p[:-1]], axis=0)
        nxt = np.concatenate([p[1:], p[-1:]], axis=0)
        up[0::2] = (3 * p + prev + 2) >> 2
        up[1::2] = (3 * p + nxt + 1) >> 2
    else:
        up = np.repeat(p, factor, axis=0)
    up = up[:size]
    if up.shape[0] < size:  # pad by edge replication
        pad = np.broadcast_to(up[-1:], (size - up.shape[0],) + up.shape[1:])
        up = np.concatenate([up, pad], axis=0)
    return np.moveaxis(up, 0, axis)


def decode(data: bytes) -> np.ndarray:
    """JPEG bytes → (H, W, C) uint8 (C ∈ {1, 3})."""
    lib = native_lib()
    if lib is None or not hasattr(lib, "jpeg_decode_scan"):
        raise JPEGError("native jpeg decoder unavailable (no g++)")
    if data[:2] != b"\xff\xd8":
        raise JPEGError("not a JPEG (missing SOI)")

    quant = np.zeros((4, 64), np.int32)
    hc = np.zeros((8, 16), np.int32)  # 0-3 DC, 4-7 AC
    hv = np.zeros((8, 256), np.int32)
    frame = None
    restart = 0
    pos = 2
    n = len(data)
    while pos + 4 <= n:
        if data[pos] != 0xFF:
            pos += 1
            continue
        marker = data[pos + 1]
        if marker == 0xFF:  # fill bytes before a marker (T.81 B.1.1.2)
            pos += 1
            continue
        if marker in (0x01,) or 0xD0 <= marker <= 0xD7:
            pos += 2
            continue
        (seglen,) = struct.unpack(">H", data[pos + 2 : pos + 4])
        body = data[pos + 4 : pos + 2 + seglen]
        if marker == 0xDB:  # DQT
            b = 0
            while b < len(body):
                pq, tq = body[b] >> 4, body[b] & 15
                b += 1
                if pq == 0:
                    quant[tq] = np.frombuffer(body[b : b + 64], np.uint8)
                    b += 64
                else:
                    quant[tq] = np.frombuffer(
                        body[b : b + 128], ">u2"
                    ).astype(np.int32)
                    b += 128
        elif marker == 0xC4:  # DHT
            b = 0
            while b < len(body):
                tc, th = body[b] >> 4, body[b] & 15
                b += 1
                counts = np.frombuffer(body[b : b + 16], np.uint8)
                b += 16
                total = int(counts.sum())
                vals = np.frombuffer(body[b : b + total], np.uint8)
                b += total
                t = (0 if tc == 0 else 4) + th
                hc[t] = counts
                hv[t, :total] = vals
        elif marker in (0xC0, 0xC1):  # SOF0/1 (baseline / ext. sequential)
            depth, h, w, nc = body[0], *struct.unpack(">HH", body[1:5]), body[5]
            if depth != 8:
                raise JPEGError(f"unsupported sample precision {depth}")
            comps = {}
            for i in range(nc):
                cid, hvb, tq = body[6 + 3 * i : 9 + 3 * i]
                comps[cid] = (hvb >> 4, hvb & 15, tq)
            frame = (h, w, comps)
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise JPEGError(
                f"unsupported JPEG type (marker 0xFF{marker:02X}); "
                "baseline (SOF0) only"
            )
        elif marker == 0xDD:  # DRI
            (restart,) = struct.unpack(">H", body[:2])
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise JPEGError("SOS before SOF")
            ns = body[0]
            scan = []
            for i in range(ns):
                cid, tt = body[1 + 2 * i], body[2 + 2 * i]
                scan.append((cid, tt >> 4, tt & 15))
            entropy_start = pos + 2 + seglen
            return _decode_scan(
                lib, data, entropy_start, frame, scan, quant, hc, hv, restart
            )
        pos += 2 + seglen
    raise JPEGError("no SOS marker found")


def _decode_scan(lib, data, start, frame, scan, quant, hc, hv, restart):
    h, w, comps = frame
    ncomp = len(scan)
    hmax = max(c[0] for c in comps.values())
    vmax = max(c[1] for c in comps.values())
    mcu_cols = -(-w // (8 * hmax))
    mcu_rows = -(-h // (8 * vmax))

    comp_arr = np.zeros((ncomp, 5), np.int32)
    planes = []
    ptrs = (ctypes.POINTER(ctypes.c_uint8) * ncomp)()
    strides = np.zeros(ncomp, np.int32)
    for i, (cid, dc_t, ac_t) in enumerate(scan):
        if cid not in comps:
            raise JPEGError(f"scan references unknown component {cid}")
        ch, cv, tq = comps[cid]
        comp_arr[i] = (ch, cv, tq, dc_t, ac_t)
        plane = np.zeros((mcu_rows * cv * 8, mcu_cols * ch * 8), np.uint8)
        planes.append(plane)
        ptrs[i] = plane.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))
        strides[i] = plane.shape[1]

    entropy = np.frombuffer(data[start:], np.uint8)
    rc = lib.jpeg_decode_scan(
        entropy.ctypes.data_as(lib.u8p),
        entropy.size,
        ncomp,
        np.ascontiguousarray(comp_arr).ctypes.data_as(lib.i32p),
        np.ascontiguousarray(hc).ctypes.data_as(lib.i32p),
        np.ascontiguousarray(hv).ctypes.data_as(lib.i32p),
        np.ascontiguousarray(quant).ctypes.data_as(lib.i32p),
        mcu_cols,
        mcu_rows,
        restart,
        ptrs,
        strides.ctypes.data_as(lib.i32p),
    )
    if rc != 0:
        raise JPEGError(f"entropy decode failed (rc={rc})")

    # crop each plane to its natural resolution, upsample to full size
    full = []
    for i, (cid, _, _) in enumerate(scan):
        ch, cv, _ = comps[cid]
        cw = -(-w * ch // hmax)
        chh = -(-h * cv // vmax)
        p = planes[i][:chh, :cw]
        p = _triangle_upsample_axis(p, hmax // ch, 1, w)
        p = _triangle_upsample_axis(p, vmax // cv, 0, h)
        full.append(p.astype(np.int32))

    if ncomp == 1:
        return full[0].astype(np.uint8)[:, :, None]
    if ncomp == 3:
        y, cb, cr = (f.astype(np.float64) for f in full)
        cb -= 128.0
        cr -= 128.0
        r = y + 1.402 * cr
        g = y - 0.344136286 * cb - 0.714136286 * cr
        b = y + 1.772 * cb
        rgb = np.stack([r, g, b], axis=-1)
        return np.clip(np.round(rgb), 0, 255).astype(np.uint8)
    raise JPEGError(f"unsupported component count {ncomp}")
