"""Pick the best checkpoint DIRECTORY from a preference-ordered list.

Prints the candidate dir whose latest COMPLETE checkpoint (validated via
sow_tpu.checkpoint.complete_checkpoints — partial/empty ``model_N`` dirs
are skipped) has the highest step; ties go to earlier candidates.

Replaces the round-4 stage scripts' ``ls "$CKPT"/*/`` fallback, which any
broken dir satisfied: the wedged resetsched_ckpt (empty ``model_12000/``)
would have been selected and crashed stages 3 and 4 (VERDICT r4 weak #4).

Usage: python benchmarks/pick_ckpt.py DIR [DIR ...]
Exit status 1 if no candidate holds any complete checkpoint.
"""

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sow_tpu.checkpoint import complete_checkpoints  # noqa: E402


def main(candidates: list[str]) -> int:
    best_dir, best_step = None, -1
    for d in candidates:
        ckpts = complete_checkpoints(d)
        if not ckpts:
            continue
        step = int(re.search(r"model_(\d+)$", ckpts[0]).group(1))
        if step > best_step:
            best_dir, best_step = d, step
    if best_dir is None:
        print("no complete checkpoint in any candidate", file=sys.stderr)
        return 1
    print(best_dir)
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
