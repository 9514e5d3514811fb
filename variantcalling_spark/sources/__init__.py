from variantcalling_spark.sources.tables import TABLES, load_table, load_tables, register_views  # noqa: F401
from variantcalling_spark.sources.bed import read_bed, read_interval_list, to_bed_lines  # noqa: F401
from variantcalling_spark.sources.vcf import read_vcf, to_vcf_lines, vcf_header  # noqa: F401
from variantcalling_spark.sources.reads import (  # noqa: F401
    mpileup_to_base_observations,
    parse_sam_lines,
    read_mpileup,
    read_sam_flat,
    sam_to_read_intervals,
)
