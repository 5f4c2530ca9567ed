#!/usr/bin/env python3
"""Top-level image-codec RD evaluation CLI (EVC-style).

Usage:
  python eval_image.py --model_type EVC_LL --test_config kodak.json \
      --output_path out.json --rate_num 4
"""

from opendcvc_tpu.eval.image_harness import main

if __name__ == "__main__":
    main()
