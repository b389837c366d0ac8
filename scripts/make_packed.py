#!/usr/bin/env python
"""Pack an image folder into a packed-record store (the reference's
scripts create LMDBs via lmdb_util.make_lmdb_from_imgs; this is the
packed-store counterpart usable by FileClient('packed') datasets).

  python scripts/make_packed.py DATA_DIR OUT.pkdb [--suffix .png]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("data_dir")
    ap.add_argument("out")
    ap.add_argument("--suffix", default=None,
                    help="only pack files with this suffix")
    ap.add_argument("--compress-level", type=int, default=1)
    args = ap.parse_args(argv)

    from unitex_tpu.utils.file_client import make_packed_from_imgs, scandir
    rels = sorted(scandir(args.data_dir, suffix=args.suffix, recursive=True))
    if not rels:
        raise SystemExit(f"no images under {args.data_dir}")
    make_packed_from_imgs(args.data_dir, args.out, rels,
                          compress_level=args.compress_level)
    print(f"packed {len(rels)} images -> {args.out}", flush=True)


if __name__ == "__main__":
    main()
