#!/usr/bin/env python3
"""Generate minimal TIFF fixtures for the image_meta kernel + oracle.

Three shapes: little-endian with SHORT dims, big-endian with LONG dims,
and a truncated file whose IFD offset points past EOF (format detected,
dims null). Headers only — no strip data is needed for header parsing.
"""
import struct, os

OUT = os.path.join(os.path.dirname(__file__), "..", "fixtures", "media")


def entry(fmt, tag, typ, count, value):
    # value packed into the 4-byte value field in file byte order;
    # SHORT occupies the first two bytes of the field
    if typ == 3:
        vf = struct.pack(fmt + "HH", value, 0)
    else:
        vf = struct.pack(fmt + "I", value)
    return struct.pack(fmt + "HHI", tag, typ, count) + vf


def tiff(le, dims_type, width, height, ifd_off=8, entries_extra=True):
    fmt = "<" if le else ">"
    hdr = (b"II" + struct.pack("<H", 42) if le else b"MM" + struct.pack(">H", 42))
    hdr += struct.pack(fmt + "I", ifd_off)
    es = [entry(fmt, 256, dims_type, 1, width),
          entry(fmt, 257, dims_type, 1, height)]
    if entries_extra:
        es.append(entry(fmt, 259, 3, 1, 1))  # Compression=none, skipped
    body = struct.pack(fmt + "H", len(es)) + b"".join(es) + struct.pack(fmt + "I", 0)
    return hdr + body


os.makedirs(OUT, exist_ok=True)
with open(os.path.join(OUT, "img_30.tif"), "wb") as f:
    f.write(tiff(le=True, dims_type=3, width=640, height=480))
with open(os.path.join(OUT, "img_31.tif"), "wb") as f:
    f.write(tiff(le=False, dims_type=4, width=70000, height=12345))
with open(os.path.join(OUT, "img_32.tif"), "wb") as f:
    # IFD offset far beyond EOF -> ('tiff', null, null)
    f.write((b"II" + struct.pack("<H", 42) + struct.pack("<I", 999999)))
print("wrote img_30.tif img_31.tif img_32.tif")
