"""dcm2bids-style rule source (SURVEY.md S7, D7).

Reference: config.json holds an ordered ``descriptions`` list of
classification rules (dataType, modalityLabel, criteria{field: glob})
consumed by dcm2bids (convert2BIDS.sh:10; config.json:3-57).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def read_dcm2bids_rules(spark: SparkSession, path: str) -> DataFrame:
    """Parse a dcm2bids config.json into an ordered rule table:
    (priority, dataType, modalityLabel, customLabels,
    criteria_field, criteria_pattern).

    Priority = position in the descriptions array (first match wins),
    made explicit as a column — never rely on file order downstream
    (SURVEY.md §7.4#5).
    """
    raw = spark.read.option("multiLine", True).json(path)
    desc = raw.select(
        F.posexplode(F.col("descriptions")).alias("priority", "rule")
    )
    rule = F.col("rule")
    crit = rule["criteria"]
    # criteria is an object with exactly one of the known match fields
    field = (
        F.when(crit["SeriesDescription"].isNotNull(), "SeriesDescription")
        .when(crit["SidecarFilename"].isNotNull(), "SidecarFilename")
        .otherwise(None)
    )
    pattern = F.coalesce(crit["SeriesDescription"], crit["SidecarFilename"])
    return desc.select(
        "priority",
        rule["dataType"].alias("dataType"),
        rule["modalityLabel"].alias("modalityLabel"),
        rule["customLabels"].alias("customLabels"),
        field.alias("criteria_field"),
        pattern.alias("criteria_pattern"),
    )
