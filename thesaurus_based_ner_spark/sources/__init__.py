from thesaurus_based_ner_spark.sources.webtext import (  # noqa: F401
    WEBTEXT_SCHEMA,
    synth_webtext,
    synth_thesaurus,
    synth_ontology_edges,
    synth_anchor_text,
    synth_redirects,
)
from thesaurus_based_ner_spark.sources.catalog import Catalog  # noqa: F401
