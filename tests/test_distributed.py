"""Single-process tests for the multi-host helpers."""

import jax
import pytest

from admm_deconv_tpu.parallel import distributed


class TestDistributedHelpers:
    def test_single_process(self):
        assert not distributed.is_multi_host()
        assert jax.process_count() == 1

    def test_local_batch_slice(self):
        s = distributed.local_batch_slice(8)
        assert s == slice(0, 8)

    def test_indivisible_batch_rejected(self):
        # process_count == 1 divides everything; simulate failure via 0.
        with pytest.raises(ValueError):
            # 7 % 2 != 0 can't be tested single-process; use monkeypatch.
            import unittest.mock as mock

            with mock.patch.object(jax, "process_count", return_value=2):
                distributed.local_batch_slice(7)
