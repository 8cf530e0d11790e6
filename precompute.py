#!/usr/bin/env python
"""Precompute training-set self-kNN ground truth (reference precompute.py analogue).

Example:
    python precompute.py glove_100
"""
from nlsh_tpu.cli.precompute import main

if __name__ == "__main__":
    main()
