from end_end_data_pipeline__spark.functions.scalar import (  # noqa: F401
    dec_avg,
    dec_sum,
    micros_to_ts,
    round_down,
    to_money,
)
