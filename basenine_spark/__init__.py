"""basenine_spark: PySpark-native rebuild of the basenine capability set.

See SURVEY.md for the blueprint; bfl/ is the filter-language front-end,
engine/ the query modes, operators/ the scale extension surface.
"""

__version__ = "0.1.0"
