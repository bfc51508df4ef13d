from ipp_rl_tpu.config.schema import (  # noqa: F401
    Config,
    EnvironmentConfig,
    MappingConfig,
    MCTSZeroHyperParams,
    MissionConfig,
    ScenarioConfig,
    SensorConfig,
    UAVConfig,
    load_config,
)
