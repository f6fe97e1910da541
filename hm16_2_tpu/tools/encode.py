"""Encoder CLI (TAppEncoder dual): encode planar YUV to an Annex-B stream.

Usage: python -m hm16_2_tpu.tools.encode in.yuv -wdt W -hgt H -f N -q QP -b out.bin [-o rec.yuv]
"""

import argparse
import sys
import time

from hm16_2_tpu.encode.top import Encoder, EncoderConfig
from hm16_2_tpu.io.yuv import read_yuv_frame, write_yuv_frame


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("input")
    ap.add_argument("-wdt", type=int, required=True)
    ap.add_argument("-hgt", type=int, required=True)
    ap.add_argument("-f", "--frames", type=int, default=1)
    ap.add_argument("-q", "--qp", type=int, default=32)
    ap.add_argument("-b", "--bitstream", required=True)
    ap.add_argument("-o", "--recon", default=None)
    ap.add_argument("--no-deblock", action="store_true")
    args = ap.parse_args(argv)

    cfg = EncoderConfig(args.wdt, args.hgt, qp=args.qp,
                        deblock=not args.no_deblock)
    enc = Encoder(cfg)
    fin = open(args.input, "rb")
    fout = open(args.bitstream, "wb")
    frec = open(args.recon, "wb") if args.recon else None
    t0 = time.time()
    total = 0
    for poc in range(args.frames):
        planes = read_yuv_frame(fin, args.wdt, args.hgt)
        if planes is None:
            break
        au = enc.encode_frame(planes, poc)
        fout.write(au)
        total += len(au)
        print(f"POC {poc:4d} ( I-SLICE, QP {args.qp} ) {len(au)*8} bits")
        if frec:
            write_yuv_frame(frec, enc.last_recon, [8, 8, 8])
    dt = time.time() - t0
    print(f"Bytes written to file: {total}")
    print(f"Total Time: {dt:.3f} sec ({enc.frames_coded/dt:.3f} fps)")
    fout.close()
    if frec:
        frec.close()
    return 0


if __name__ == "__main__":
    sys.exit(main())
