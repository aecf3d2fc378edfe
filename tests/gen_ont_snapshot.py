"""Regenerate the ONT window-scale snapshot
(tests/data/ont_window_500kb.vcf) used by tests/test_ont_window.py.

Run from the repo root after an INTENTIONAL behavior change:
    JAX_PLATFORMS=cpu python tests/gen_ont_snapshot.py
and review the diff before committing.
"""

import io
import pathlib
import sys
import tempfile

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent))

from longcalld_tpu.config import CallOpts
from longcalld_tpu.core.pipeline import run_call

import test_ont_window

OUT = pathlib.Path(__file__).resolve().parent / "data" / \
    "ont_window_500kb.vcf"


def main() -> None:
    with tempfile.TemporaryDirectory() as d:
        _ref4, _truth, _beg, _end, fa_fn, bam_fn = \
            test_ont_window.build_scene(pathlib.Path(d),
                                        "/root/reference/test_data/"
                                        "chr11_2M.fa")
        opt = CallOpts.ont(ref_fa_fn=fa_fn, in_bam_fns=[bam_fn],
                           use_device=False, n_threads=2, host_procs=0)
        buf = io.StringIO()
        n = run_call(opt, buf, "ont-snapshot")
    body = [ln for ln in buf.getvalue().splitlines()
            if not ln.startswith("#")]
    OUT.write_text("\n".join(body) + "\n")
    print(f"wrote {n} records to {OUT}")


if __name__ == "__main__":
    main()
