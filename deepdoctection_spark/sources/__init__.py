"""Sources: transcript table construction + payload templates + IO helpers.

The reference's analogues are the Serializer* scans
(/root/reference/deepdoctection/dataflow/custom_serialize.py) and the synthetic
FakeData generator (/root/reference/deepdoctection/dataflow/serialize.py:77-131).
"""
