"""Merge chunked mapping outputs into one map pickle.

Parity with reference demo/merge_demo_output.py (RomanMap.concatenate over
time-chunked maps, used with demo.py --max-time).
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.realpath(__file__))))

from roman_tpu.map.roman_map import RomanMap  # noqa: E402

if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("inputs", nargs="+", help="chunk .pkl files (in order)")
    parser.add_argument("-o", "--output", required=True)
    args = parser.parse_args()

    maps = [RomanMap.from_pickle(p) for p in args.inputs]
    merged = RomanMap.concatenate(maps)
    merged.save(args.output)
    print(f"merged {len(maps)} chunks -> {len(merged.segments)} segments "
          f"at {args.output}")
