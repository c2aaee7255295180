"""realtimevotingdataengineer_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first re-expression of the query and data-processing
capabilities of the reference repo jeremyprodata/RealTimeVotingDataEngineer
(see SURVEY.md for the file:line capability map), extended with the
large-scale training-data-pipeline operators (dedup, similarity search,
text analysis, multimodal columns).

Design stance (SURVEY.md §4, §7): declare logical plans with the
DataFrame/SQL API and let Catalyst/Tungsten pick physical strategies; no
custom IR, no custom physical operators; Python UDFs only where built-in
expressions genuinely cannot express the semantics (and then Arrow-batched).
"""

__version__ = "0.1.0"
