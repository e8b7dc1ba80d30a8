"""MiFID/FID evaluation subsystem — standalone, like the reference EVAL
package ("No dependencies on training code", EVAL/IMPLEMENTATION_NOTES.md:7).

Package exports mirror EVAL/eval/__init__.py:8-25."""

from gan_variant_research_tpu.evalsuite.mifid import (
    compute_full_evaluation,
    compute_mifid_and_fid,
    compute_cosine_distances_batched,
    compute_cosine_distance_statistics,
    find_worst_memorization_cases,
)
from gan_variant_research_tpu.evalsuite.features import (
    InceptionFeatureExtractor,
    compute_or_load_real_stats,
)
from gan_variant_research_tpu.evalsuite.report import (
    create_report,
    save_report,
    create_text_summary,
    save_text_summary,
    save_worst_cases_csv,
    print_quick_summary,
)
from gan_variant_research_tpu.evalsuite.utils import (
    enumerate_images,
    compute_image_list_hash,
    validate_image_counts,
    check_dataset_overlap,
    timer,
)

__all__ = [
    "compute_full_evaluation",
    "compute_mifid_and_fid",
    "compute_cosine_distances_batched",
    "compute_cosine_distance_statistics",
    "find_worst_memorization_cases",
    "InceptionFeatureExtractor",
    "compute_or_load_real_stats",
    "create_report",
    "save_report",
    "create_text_summary",
    "save_text_summary",
    "save_worst_cases_csv",
    "print_quick_summary",
    "enumerate_images",
    "compute_image_list_hash",
    "validate_image_counts",
    "check_dataset_overlap",
    "timer",
]
