"""Pure-logic tests for the downloader's fuzzy name resolution
(reference parity: sgdml/get.py:71-175 interactive resolution; here the
resolution logic is pure and testable offline)."""

import pytest

from sgdml_tpu import download


def test_resolve_exact():
    assert download.resolve('ethanol') == 'md17_ethanol.npz'
    assert download.resolve('at_at') == 'md22_AT-AT.npz'


def test_resolve_case_and_dash_insensitive():
    assert download.resolve('Ethanol') == 'md17_ethanol.npz'
    assert download.resolve('AT-AT') == 'md22_AT-AT.npz'
    assert download.resolve('ac-ala3-nhme') == 'md22_Ac-Ala3-NHMe.npz'


def test_resolve_fuzzy_unique(capsys):
    # One close match -> resolved with a notice.
    assert download.resolve('ethanl') == 'md17_ethanol.npz'
    assert 'Assuming' in capsys.readouterr().out


def test_resolve_ambiguous_lists_candidates():
    # 'at_at_cg' is close to both at_at and at_at_cg_cg.
    with pytest.raises(SystemExit) as e:
        download.resolve('at_at_cg')
    assert 'Did you mean' in str(e.value)


def test_resolve_unknown_lists_catalog():
    with pytest.raises(SystemExit) as e:
        download.resolve('zzzzzz')
    assert 'Available' in str(e.value)


def test_catalog_covers_baseline_configs():
    # BASELINE.md configs reference these systems by name.
    for name in ('ethanol', 'aspirin', 'benzene', 'toluene', 'at_at'):
        assert name in download.DATASETS


def test_main_list(capsys):
    download.main(['list'])
    out = capsys.readouterr().out
    assert 'md17_ethanol.npz' in out and 'md22_AT-AT.npz' in out
