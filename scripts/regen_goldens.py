"""Regenerate format-stability goldens in tests/test_format_stability.py."""
import hashlib, re, sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from colcrush.codecs import encode_array
from colcrush.fixtures import source_code_table

tbl = source_code_table(100, n_repos=10)
h = hashlib.sha256()
for col in tbl.column_names:
    for v in tbl.column(col).to_pylist():
        h.update(v.encode())
fixture_sha = h.hexdigest()

tbl2 = source_code_table(200, n_repos=10)
goldens = {}
for col in ("content", "lang", "path"):
    arr = tbl2.column(col).combine_chunks()
    blob, meta = encode_array(arr)
    goldens[col] = (meta["codec"], hashlib.sha256(blob).hexdigest()[:16])

p = "tests/test_format_stability.py"
s = open(p).read()
s = re.sub(r'_FIXTURE_SHA = .*', f'_FIXTURE_SHA = "{fixture_sha}"', s)
s = re.sub(r'_BLOB_GOLDENS = .*', f'_BLOB_GOLDENS = {goldens!r}', s)
open(p, "w").write(s)
print("goldens:", fixture_sha[:16], goldens)

# dec128 goldens
import decimal, pyarrow as pa
D = decimal.Decimal
dec_cases = [
    pa.array([D(i * 7 % 1000) / 100 for i in range(500)] + [None], type=pa.decimal128(38, 18)),
    pa.array([D("0.123456789123456789") * i for i in range(64)], type=pa.decimal128(38, 18)),
]
dec_goldens = [hashlib.sha256(encode_array(a)[0]).hexdigest()[:16] for a in dec_cases]
s = open(p).read()
s = re.sub(r"_DEC128_GOLDENS = .*", f"_DEC128_GOLDENS = {dec_goldens!r}", s)
open(p, "w").write(s)
print("dec128 goldens:", dec_goldens)
