"""End-to-end varda user lifecycle on the VardaWarehouse façade:
create → import → activate → frequency/annotate, with the A7 duplicate
guard and activation gating — the workflow a reference user runs over
REST, as library calls (SURVEY §3)."""

import pytest

from varda_spark.api import DuplicateImportError, VardaWarehouse

VCF_A = """##fileformat=VCFv4.2
#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\tNA1
chr1\t100\t.\tA\tG\t50\tPASS\t.\tGT\t0/1
chr1\t300\t.\tC\tT\t50\tPASS\t.\tGT\t1/1
"""

VCF_B = """##fileformat=VCFv4.2
#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\tNB1
chr1\t100\t.\tA\tG\t50\tPASS\t.\tGT\t1/1
"""

BED_A = "chr1\t50\t200\n"


def test_full_lifecycle(spark, tmp_path):
    wh = VardaWarehouse(spark, str(tmp_path / "wh"))
    va, vb = tmp_path / "a.vcf", tmp_path / "b.vcf"
    va.write_text(VCF_A)
    vb.write_text(VCF_B)
    bed = tmp_path / "a.bed"
    bed.write_text(BED_A)

    sa = wh.create_sample("A", public=True)
    sb = wh.create_sample("B", public=False)
    # ids are content hashes of the name: distinct, stable, race-free
    assert sa != sb and sa > 0 and sb > 0
    import hashlib

    assert sa == int.from_bytes(hashlib.sha1(b"A").digest()[:8], "big") >> 2
    import pytest

    with pytest.raises(ValueError):
        wh.create_sample("A")  # duplicate name rejected

    assert wh.import_variation(sa, str(va)) == 2
    assert wh.import_coverage(sa, str(bed)) == 1
    assert wh.import_variation(sb, str(vb)) == 1

    # A7: the same content cannot land twice
    with pytest.raises(DuplicateImportError):
        wh.import_variation(sb, str(va))

    # nothing counts before activation
    f0 = {r.position: r.vn for r in wh.frequency().collect()}
    assert set(f0.values()) == {0}

    wh.activate_sample(sa)
    wh.activate_sample(sb)

    # A has coverage 50-200 (covers pos 100, not 300); B covers genome-wide
    f = {(r.position): (r.vn, r.vc, r.vf) for r in wh.frequency().collect()}
    assert f[100] == (2, 2, 1.0)     # both cover 100, both carry A>G
    assert f[300] == (1, 1, 1.0)     # only B's genome-wide pool at 300
    # selection narrows to the public sample: A is uncovered at 300 (vn 0)
    # but its observation still counts in vc — varda counts support
    # independently of the coverage denominator
    fp = {r.position: (r.vn, r.vc) for r in wh.frequency(selection="public").collect()}
    assert fp[100] == (1, 1) and fp[300] == (0, 1)

    ann = wh.annotate(str(va), {"ALL": "*", "PUB": "public"}).collect()
    by_pos = {r.position: r for r in ann}
    assert by_pos[100].ALL_vn == 2 and by_pos[100].PUB_vn == 1
    assert by_pos[300].ALL_vf == 1.0
