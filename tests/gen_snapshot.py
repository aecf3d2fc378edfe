"""Regenerate the checked-in HiFi snapshot VCF (tests/data/hg002_chr11_hifi.vcf).

Run from the repo root after an INTENTIONAL behavior change:
    JAX_PLATFORMS=cpu python tests/gen_snapshot.py
and review the diff before committing.  test_e2e_hifi.py diffs the pipeline
output against this file line by line.
"""
import io
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from longcalld_tpu.config import CallOpts
from longcalld_tpu.core.pipeline import run_call

REF = "/root/reference/test_data/chr11_2M.fa"
BAM = "/root/reference/test_data/HG002_chr11_hifi_test.bam"
OUT = pathlib.Path(__file__).resolve().parent / "data" / "hg002_chr11_hifi.vcf"


def main() -> None:
    opt = CallOpts.hifi(ref_fa_fn=REF, in_bam_fns=[BAM], use_device=False)
    buf = io.StringIO()
    n = run_call(opt, buf, "snapshot")
    body = [l for l in buf.getvalue().splitlines() if not l.startswith("#")]
    OUT.write_text("\n".join(body) + "\n")
    print(f"wrote {n} records to {OUT}")


if __name__ == "__main__":
    main()
