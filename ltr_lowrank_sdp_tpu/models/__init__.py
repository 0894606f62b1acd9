from .net import GNNEncoder, RankSchedulePredictor, RankPredictor  # noqa: F401
