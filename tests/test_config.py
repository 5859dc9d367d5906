from __future__ import annotations

import pytest

from py_datalake_move_files_spark.config import LakeConfig, abfss_uri, azure_oauth_conf


def test_from_env_and_validate():
    cfg = LakeConfig.from_env(
        {
            "AZURE_TENANT_ID": "t",
            "AZURE_CLIENT_ID": "c",
            "AZURE_CLIENT_SECRET": "s",
            "AZURE_STORAGE_ACCOUNT_NAME": "acct",
            "AZURE_STORAGE_CONTAINER": "lake",
            "SOURCE_PREFIX": "raw/",
        }
    )
    assert cfg.validate() == []
    conf = azure_oauth_conf(cfg)
    acct = "acct.dfs.core.windows.net"
    assert conf[f"spark.hadoop.fs.azure.account.auth.type.{acct}"] == "OAuth"
    assert "login.microsoftonline.com/t/" in conf[
        f"spark.hadoop.fs.azure.account.oauth2.client.endpoint.{acct}"
    ]
    assert abfss_uri(cfg, "/raw/x.json") == f"abfss://lake@{acct}/raw/x.json"


def test_missing_keys_fail_fast():
    cfg = LakeConfig.from_env({})
    assert set(cfg.validate()) == {
        "tenant_id",
        "client_id",
        "client_secret",
        "account_name",
    }
    with pytest.raises(ValueError, match="missing Azure config"):
        azure_oauth_conf(cfg)
