#!/usr/bin/env python3
"""Top-level RD evaluation CLI (reference-compatible flags and configs).

Usage example:
  python eval_video.py --test_config config.json --output_path out.json \
      --model_path_i ckpt_i.msgpack --model_path_p ckpt_p.msgpack \
      --rate_num 4 --write_stream 1 --verbose 1
"""

from opendcvc_tpu.eval.harness import main

if __name__ == "__main__":
    main()
