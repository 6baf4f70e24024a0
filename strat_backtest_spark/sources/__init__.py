from strat_backtest_spark.sources.bars import (  # noqa: F401
    bars_from_events,
    load_bars_csv,
    load_bars_parquet,
    load_testdata,
    resample_bars,
    write_bars_csv,
    write_bars_parquet,
)
from strat_backtest_spark.sources.bucketed import read_bucketed, write_bucketed  # noqa: F401
from strat_backtest_spark.sources.config import RedditConfig, load_reddit_config  # noqa: F401
from strat_backtest_spark.sources.reddit import (  # noqa: F401
    comments_from_envelope,
    posts_from_json,
    reddit_documents,
)
from strat_backtest_spark.sources.symbols import load_symbols, load_stopwords  # noqa: F401
from strat_backtest_spark.sources.yahoo import (  # noqa: F401
    download_bars,
    market_benchmark,
    ticker_history,
)
