#!/usr/bin/env python3
"""Deterministic video fixture blobs for the video_meta kernel + oracle
(fixtures/video/vid_NN.{mp4,avi,dat}). Box/chunk layout is REAL per the
ISO-BMFF and AVI specs; payload bodies are tiny deterministic filler.
Re-running reproduces the committed bytes exactly."""
import os, struct

OUT = os.path.join(os.path.dirname(__file__), "..", "fixtures", "video")
os.makedirs(OUT, exist_ok=True)


def box(typ, body):
    return struct.pack(">I", 8 + len(body)) + typ + body


def largesize_box(typ, body):
    return struct.pack(">I", 1) + typ + struct.pack(">Q", 16 + len(body)) + body


def mvhd(timescale, duration, version=0):
    if version == 0:
        body = bytes([0, 0, 0, 0])          # version+flags
        body += struct.pack(">II", 0, 0)    # ctime/mtime
        body += struct.pack(">II", timescale, duration)
    else:
        body = bytes([1, 0, 0, 0])
        body += struct.pack(">QQ", 0, 0)
        body += struct.pack(">I", timescale) + struct.pack(">Q", duration)
    body += struct.pack(">I", 0x00010000) + struct.pack(">H", 0x0100)  # rate, volume
    body += bytes(10) + bytes(36) + bytes(24) + struct.pack(">I", 2)
    return box(b"mvhd", body)


def tkhd(w, h, version=0):
    if version == 0:
        body = bytes([0, 0, 0, 7]) + struct.pack(">IIII", 0, 0, 1, 0)
        body += struct.pack(">I", 0)        # duration
    else:
        body = bytes([1, 0, 0, 7]) + struct.pack(">QQ", 0, 0)
        body += struct.pack(">II", 1, 0) + struct.pack(">Q", 0)
    body += bytes(8)                        # reserved
    body += struct.pack(">HHHH", 0, 0, 0, 0)  # layer/group/volume/reserved
    body += bytes(36)                       # matrix
    body += struct.pack(">II", w << 16, h << 16)  # 16.16 fixed point
    return box(b"tkhd", body)


def mp4(w, h, timescale, duration, version=0, pre_boxes=b"", trak_pre=b""):
    trak = box(b"trak", trak_pre + tkhd(w, h, version))
    moov = box(b"moov", mvhd(timescale, duration, version) + trak)
    return box(b"ftyp", b"isom" + struct.pack(">I", 512) + b"isomiso2mp41") + \
        pre_boxes + moov


def avi(w, h, us_per_frame, frames, pre_chunks=b""):
    avih = b"avih" + struct.pack("<I", 56) + struct.pack(
        "<IIIIIIII", us_per_frame, 0, 0, 0x10, frames, 0, 1, 100000) + \
        struct.pack("<IIII", w, h, 0, 0) + bytes(16)
    hdrl = b"LIST" + struct.pack("<I", 4 + len(avih)) + b"hdrl" + avih
    body = pre_chunks + hdrl
    return b"RIFF" + struct.pack("<I", 4 + len(body)) + b"AVI " + body


files = {
    "vid_00.mp4": mp4(640, 360, 1000, 10000),                    # v0, 10 s
    "vid_01.mp4": mp4(1920, 1080, 90000, 90000 * 137, version=1),  # v1, 137 s
    # free box between ftyp and moov, plus an edts box before tkhd in trak
    "vid_02.mp4": mp4(320, 240, 600, 1500, pre_boxes=box(b"free", bytes(24)),
                      trak_pre=box(b"edts", bytes(8))),
    # 64-bit largesize mdat BEFORE moov — exercises the raw==1 walk
    "vid_03.mp4": mp4(1280, 720, 25, 250,
                      pre_boxes=largesize_box(b"mdat", bytes(range(48)))),
    "vid_04.mp4": box(b"ftyp", b"isom" + bytes(8)),              # no moov
    "vid_05.avi": avi(320, 240, 33333, 300),                     # ~10 s
    "vid_06.avi": avi(1920, 1080, 16667, 1200,                   # odd-size pad
                      pre_chunks=b"JUNK" + struct.pack("<I", 11) + bytes(11) + b"\x00"),
    "vid_07.avi": b"RIFF" + struct.pack("<I", 4) + b"AVI ",      # no hdrl
    "vid_08.dat": b"this is not a video container",
    "vid_09.dat": bytes([0, 0, 0, 9]) + b"ftyp",                 # truncated ftyp (< 12)
}
for name, payload in sorted(files.items()):
    with open(os.path.join(OUT, name), "wb") as f:
        f.write(payload)
    print(f"{name}: {len(payload)} bytes")
