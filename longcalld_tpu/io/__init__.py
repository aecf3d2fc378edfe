from longcalld_tpu.io.fasta import FastaFile  # noqa: F401
from longcalld_tpu.io.bam import BamReader, BamRecord  # noqa: F401
