from mismo_ray.pipelines._affiliations import (
    affiliations_match_pairs,
    featurize_affiliations,
)
from mismo_ray.pipelines._crawl import crawl_clean, crawl_clean_pipeline, synth_crawl
from mismo_ray.pipelines._febrl import (
    febrl_comparers,
    febrl_link_pairs,
    febrl_match_pairs,
    febrl_split_link_task,
)
from mismo_ray.pipelines._rldata import rldata_match_pairs
from mismo_ray.pipelines._webpages import (
    add_extracted_text,
    extract_text_bytes,
    featurize,
    flagship,
    load_pages,
    render_html,
    run_er_pipeline,
    synth_pages,
    webpage_comparers,
)

__all__ = [
    "affiliations_match_pairs",
    "featurize_affiliations",
    "crawl_clean",
    "crawl_clean_pipeline",
    "synth_crawl",
    "febrl_comparers",
    "febrl_link_pairs",
    "febrl_match_pairs",
    "febrl_split_link_task",
    "rldata_match_pairs",
    "add_extracted_text",
    "extract_text_bytes",
    "featurize",
    "flagship",
    "load_pages",
    "render_html",
    "run_er_pipeline",
    "synth_pages",
    "webpage_comparers",
]
