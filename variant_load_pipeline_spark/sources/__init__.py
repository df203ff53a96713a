from . import cf2, fasta, polyphen, snpeff, vcf, wiggle  # noqa: F401
