from ao_tpu.testing.contract import run_config_contract

__all__ = ["run_config_contract"]
