"""Minimal animated-GIF writer (replaces imageio, ref opti.py:284-384
/ animate_optimization.py) built on matplotlib's PNG rendering + PIL if
available, else a pure-python GIF89a encoder for palettized frames."""

from __future__ import annotations

import numpy as np


def _read_png(path: str) -> np.ndarray:
    import matplotlib.image as mpimg

    img = mpimg.imread(path)
    if img.dtype != np.uint8:
        img = (img * 255).astype(np.uint8)
    return img[..., :3]


def write_gif(png_paths, out_path: str, fps: float = 4.0) -> str:
    frames = [_read_png(p) for p in png_paths]
    # harmonize frame sizes (crop to min)
    h = min(f.shape[0] for f in frames)
    w = min(f.shape[1] for f in frames)
    frames = [f[:h, :w] for f in frames]
    try:
        from PIL import Image

        imgs = [Image.fromarray(f) for f in frames]
        imgs[0].save(out_path, save_all=True, append_images=imgs[1:],
                     duration=int(1000 / fps), loop=0)
        return out_path
    except ImportError:
        pass
    _write_gif89a(frames, out_path, fps)
    return out_path


def _write_gif89a(frames, out_path: str, fps: float) -> None:
    """Pure-python GIF89a with a fixed 6x6x6 color cube palette."""
    h, w = frames[0].shape[:2]
    levels = np.linspace(0, 255, 6).astype(np.uint8)
    palette = bytearray()
    for r in levels:
        for g in levels:
            for b in levels:
                palette += bytes((r, g, b))
    palette += bytes(3 * (256 - 216))

    def quantize(img):
        q = np.rint(img.astype(np.float32) / 51.0).astype(np.int32)
        return (q[..., 0] * 36 + q[..., 1] * 6 + q[..., 2]).astype(np.uint8)

    def lzw_encode(data: np.ndarray, min_code_size: int = 8) -> bytes:
        clear = 1 << min_code_size
        end = clear + 1
        table = {bytes([i]): i for i in range(clear)}
        next_code = end + 1
        code_size = min_code_size + 1
        out_bits = []

        def emit(code, size):
            out_bits.append((code, size))

        emit(clear, code_size)
        prefix = b""
        for px in data.tobytes():
            cand = prefix + bytes([px])
            if cand in table:
                prefix = cand
            else:
                emit(table[prefix], code_size)
                table[cand] = next_code
                next_code += 1
                if next_code > (1 << code_size) and code_size < 12:
                    code_size += 1
                elif next_code >= 4096:
                    emit(clear, code_size)
                    table = {bytes([i]): i for i in range(clear)}
                    next_code = end + 1
                    code_size = min_code_size + 1
                prefix = bytes([px])
        if prefix:
            emit(table[prefix], code_size)
        emit(end, code_size)

        # pack bits LSB-first
        buf = bytearray()
        acc = 0
        nbits = 0
        for code, size in out_bits:
            acc |= code << nbits
            nbits += size
            while nbits >= 8:
                buf.append(acc & 0xFF)
                acc >>= 8
                nbits -= 8
        if nbits:
            buf.append(acc & 0xFF)
        return bytes(buf)

    with open(out_path, "wb") as f:
        f.write(b"GIF89a")
        f.write(np.uint16(w).tobytes() + np.uint16(h).tobytes())
        f.write(bytes((0xF7, 0, 0)))  # GCT, 256 colors
        f.write(palette)
        # loop forever
        f.write(b"\x21\xFF\x0BNETSCAPE2.0\x03\x01\x00\x00\x00")
        delay = int(100 / fps)
        for frame in frames:
            f.write(b"\x21\xF9\x04\x00" + np.uint16(delay).tobytes() + b"\x00\x00")
            f.write(b"\x2C" + bytes(4) + np.uint16(w).tobytes()
                    + np.uint16(h).tobytes() + b"\x00")
            f.write(bytes([8]))
            data = lzw_encode(quantize(frame))
            for i in range(0, len(data), 255):
                chunk = data[i:i + 255]
                f.write(bytes([len(chunk)]) + chunk)
            f.write(b"\x00")
        f.write(b"\x3B")
