"""Query-catalog package. ``load_all()`` imports every catalog module
(each registers into catalog.QUERIES) and returns the registry."""

from __future__ import annotations


def load_all():
    from slacken_spark.plans import catalog

    # each import populates catalog.QUERIES
    from slacken_spark.plans import catalog_docs  # noqa: F401
    from slacken_spark.plans import catalog_events  # noqa: F401
    from slacken_spark.plans import catalog_docs_cdc  # noqa: F401
    from slacken_spark.plans import catalog_docs_dedup  # noqa: F401
    from slacken_spark.plans import catalog_docs_embedding  # noqa: F401
    from slacken_spark.plans import catalog_docs_layout  # noqa: F401
    from slacken_spark.plans import catalog_docs_lm  # noqa: F401
    from slacken_spark.plans import catalog_docs_pipeline  # noqa: F401
    from slacken_spark.plans import catalog_docs_sketch  # noqa: F401
    from slacken_spark.plans import catalog_genomic  # noqa: F401
    from slacken_spark.plans import catalog_multimodal  # noqa: F401
    from slacken_spark.plans import catalog_streaming  # noqa: F401

    return catalog.QUERIES
