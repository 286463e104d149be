"""Scale-oriented custom operators (SURVEY.md §7 phase G).

These go beyond the reference's own SQL surface: deduplication
(exact / MinHash-LSH / SimHash / n-gram Jaccard), similarity search
over embedding columns, text analysis, multimodal column plumbing,
and an as-of join. All are compositions of DataFrame ops; Python
only enters via Arrow-batched pandas UDFs where built-ins cannot
express the semantics.
"""
