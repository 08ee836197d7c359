#!/usr/bin/env python3
"""Deterministic audio fixture blobs for the audio_meta kernel + oracle
(fixtures/audio/aud_NN.{wav,flac,mp3,dat}). Header bytes are REAL per the
container specs; payload bodies are tiny deterministic filler. Re-running
reproduces the committed bytes exactly."""
import os, struct

OUT = os.path.join(os.path.dirname(__file__), "..", "fixtures", "audio")
os.makedirs(OUT, exist_ok=True)


def wav(ch, rate, bits, pre_chunks=(), truncate=False):
    fmt = b"fmt " + struct.pack("<I", 16) + struct.pack(
        "<HHIIHH", 1, ch, rate, rate * ch * bits // 8, ch * bits // 8, bits)
    data = b"data" + struct.pack("<I", 8) + bytes(range(8))
    body = b""
    for cid, payload in pre_chunks:
        body += cid + struct.pack("<I", len(payload)) + payload
        if len(payload) % 2:  # RIFF chunks are word-aligned
            body += b"\x00"
    body += fmt + data
    if truncate:
        body = b"\x01\x02\x03\x04\x05\x06"  # no complete chunk header
    return b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body


def flac(rate, ch, bits, truncate=False):
    if truncate:
        return b"fLaC"
    info = struct.pack(">HH", 1024, 1024)        # min/max blocksize
    info += (0).to_bytes(3, "big") * 2           # min/max frame size
    packed = (rate << 44) | ((ch - 1) << 41) | ((bits - 1) << 36) | 4096
    info += packed.to_bytes(8, "big")            # rate/ch/bps/total samples
    info += bytes(16)                            # md5 of stream
    return b"fLaC" + bytes([0x80]) + len(info).to_bytes(3, "big") + info


def mp3(ver, layer, rate_idx, mode, id3_size=None, garbage=False):
    out = b""
    if id3_size is not None:
        ss = bytes([(id3_size >> 21) & 0x7F, (id3_size >> 14) & 0x7F,
                    (id3_size >> 7) & 0x7F, id3_size & 0x7F])
        out += b"ID3\x04\x00\x00" + ss + bytes(id3_size)
    if garbage:
        return out + b"notasyncword"
    b1 = 0xE0 | (ver << 3) | (layer << 1) | 1
    b2 = (9 << 4) | (rate_idx << 2) | 0          # bitrate idx 9, no pad
    b3 = (mode << 6)
    return out + bytes([0xFF, b1, b2, b3]) + bytes(range(32))


files = {
    "aud_00.wav": wav(1, 8000, 8),
    "aud_01.wav": wav(2, 44100, 16),
    "aud_02.wav": wav(6, 48000, 24, pre_chunks=((b"JUNK", bytes(12)),)),
    "aud_03.wav": wav(2, 96000, 32,
                      pre_chunks=((b"LIST", b"INFOIART" + bytes(3)),)),  # odd size: align pad
    "aud_04.wav": wav(0, 0, 0, truncate=True),
    "aud_05.flac": flac(44100, 2, 16),
    "aud_06.flac": flac(48000, 1, 24),
    "aud_07.flac": flac(192000, 8, 32),
    "aud_08.flac": flac(0, 1, 16, truncate=True),
    "aud_09.mp3": mp3(ver=3, layer=1, rate_idx=0, mode=0),            # V1 L3 44100 stereo
    "aud_10.mp3": mp3(ver=2, layer=1, rate_idx=0, mode=3),            # V2 L3 22050 mono
    "aud_11.mp3": mp3(ver=3, layer=1, rate_idx=2, mode=1, id3_size=100),  # ID3 + 32000 js
    "aud_12.mp3": mp3(ver=0, layer=1, rate_idx=0, mode=3),            # V2.5 11025 mono
    "aud_13.mp3": mp3(ver=0, layer=0, rate_idx=0, mode=0, id3_size=33, garbage=True),
    "aud_14.dat": b"junkjunkjunkjunkjunk",
    "aud_15.dat": b"RIFxnotawave" + bytes(range(16)),
}
for name, payload in sorted(files.items()):
    with open(os.path.join(OUT, name), "wb") as f:
        f.write(payload)
    print(f"{name}: {len(payload)} bytes")
