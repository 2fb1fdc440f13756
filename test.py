#!/usr/bin/env python
"""Test/submission driver: python test.py -c cfgs/<model>.yaml [-l L -r R]
(reference surface: registration/test.py, registration/test_mult.py,
completion/test.py). The 4-process shard sweep is replaced by one mesh
program; -l/-r index slicing is kept for compatibility."""

from houv_tpu.train.cli import test_main

if __name__ == "__main__":
    test_main()
