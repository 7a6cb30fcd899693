"""Charset fold tables (data only), run-length encoded.

Provenance — both are public data the reference also ships
(support/charset.py):
- DEFAULT_TABLE_RLE: the Sphinx charset_table from the Sphinx search
  engine documentation (sphinxsearch.com charset_table format), resolved
  to a codepoint->char map and RLE-compressed here.  Decoded form is
  byte-identical to charset_table_to_dict(default_charset).
- ACCENT_MAP_PAIRS: Carlos Bueno's accent-folding map from "Accent
  Folding for Auto-Complete" (A List Apart / github.com/aristus).

Each RLE record is mode,src_start,src_end,dst_start in hex: mode "i" maps
the run to incrementing codepoints, "c" to the constant dst codepoint.
"""

DEFAULT_TABLE_RLE = """\
i,30,39,30
i,41,5a,61
i,61,7a,61
c,c0,c5,61
i,c6,c6,e6
i,c7,c7,63
c,c8,cb,65
c,cc,cf,69
i,d1,d2,6e
c,d3,d6,6f
i,d8,d8,6f
c,d9,dc,75
i,dd,dd,79
i,df,df,73
c,e0,e5,61
i,e6,e6,e6
i,e7,e7,63
c,e8,eb,65
c,ec,ef,69
i,f1,f2,6e
c,f3,f6,6f
i,f8,f8,6f
c,f9,fc,75
i,fd,fd,79
i,ff,ff,79
c,100,105,61
c,106,10d,63
c,10e,111,64
c,112,11b,65
c,11c,123,67
c,124,127,68
c,128,131,69
c,134,135,6a
c,136,137,6b
c,139,142,6c
c,143,149,6e
c,14c,151,6f
c,154,159,72
c,15a,161,73
c,162,167,74
c,168,173,75
c,174,175,77
c,176,178,79
c,179,17e,7a
i,17f,17f,73
c,180,183,62
i,186,186,6f
c,187,188,63
c,189,18c,64
i,18e,18e,65
i,190,191,65
i,192,193,66
i,197,197,69
c,198,199,6b
i,19a,19a,6c
i,19c,19d,6d
i,19e,19f,6e
c,1a0,1a1,6f
c,1a4,1a5,70
c,1ab,1ae,74
c,1af,1b0,75
i,1b2,1b2,76
c,1b3,1b4,79
c,1b5,1b6,7a
i,1c5,1c5,64
i,1c8,1c8,6c
i,1cb,1cb,6e
c,1cd,1ce,61
c,1cf,1d0,69
c,1d1,1d2,6f
c,1d3,1dc,75
i,1dd,1dd,65
c,1de,1e1,61
c,1e2,1e3,e6
c,1e4,1e7,67
c,1e8,1e9,6b
c,1ea,1ed,6f
i,1f0,1f0,6a
i,1f2,1f2,64
c,1f4,1f5,67
c,1f8,1f9,6e
c,1fa,1fb,61
c,1fc,1fd,e6
c,1fe,1ff,6f
c,200,203,61
c,204,207,65
c,208,20b,69
c,20c,20f,6f
c,210,213,72
c,214,217,75
c,218,219,73
c,21a,21b,74
c,21e,21f,68
i,220,220,6e
i,221,221,64
c,224,225,7a
c,226,227,61
c,228,229,65
c,22a,231,6f
c,232,233,79
i,234,234,6c
i,235,235,6e
i,236,236,74
i,237,237,6a
i,23a,23a,61
c,23b,23c,63
i,23d,23d,6c
i,23e,23e,74
i,23f,23f,73
i,240,240,7a
i,243,243,62
i,244,245,75
c,246,247,65
c,248,249,6a
c,24a,24b,71
c,24c,24d,72
c,24e,24f,79
i,250,250,61
i,253,253,62
i,254,254,6f
i,255,256,63
i,257,258,64
c,25b,25e,65
i,25f,25f,6a
c,260,262,67
c,265,266,68
i,268,268,69
i,26a,26a,69
c,26b,26d,6c
c,26f,271,6d
c,272,274,6e
i,275,275,6f
c,279,281,72
i,282,282,73
i,284,284,6a
c,287,288,74
i,289,289,75
c,28b,28c,76
i,28d,28d,77
c,28e,28f,79
c,290,291,7a
i,297,297,63
i,299,299,62
i,29a,29a,65
i,29b,29c,67
i,29d,29f,6a
i,2a0,2a0,71
c,2ae,2b1,68
i,2b2,2b2,6a
c,2b3,2b6,72
i,2b7,2b7,77
i,2b8,2b8,79
i,2e1,2e1,6c
i,2e2,2e2,73
i,2e3,2e3,78
i,386,386,3b1
i,388,388,3b5
i,389,389,3b7
i,38a,38a,3b9
i,38c,38c,3bf
i,38e,38e,3c5
i,38f,38f,3c9
i,390,390,3b9
i,391,3a1,3b1
i,3a3,3a9,3c3
i,3aa,3aa,3b9
i,3ab,3ab,3c5
i,3ac,3ac,3b1
i,3ad,3ad,3b5
i,3ae,3ae,3b7
i,3af,3af,3b9
i,3b0,3b0,3c5
i,3b1,3c9,3b1
i,3ca,3ca,3b9
i,3cb,3cb,3c5
i,3cc,3cc,3bf
i,3cd,3cd,3c5
i,3ce,3ce,3c9
i,3d0,3d0,3b2
i,3d1,3d1,3b8
c,3d2,3d4,3c5
i,3d5,3d5,3c6
i,3d6,3d6,3c0
c,3d8,3d9,3d9
c,3da,3db,3db
c,3dc,3dd,3dd
c,3de,3df,3df
c,3e0,3e1,3e1
c,3e2,3e3,3e3
c,3e4,3e5,3e5
c,3e6,3e7,3e7
c,3e8,3e9,3e9
c,3ea,3eb,3eb
c,3ec,3ed,3ed
c,3ee,3ef,3ef
i,3f0,3f0,3ba
i,3f1,3f1,3c1
i,3f2,3f2,3c3
i,3f3,3f3,3f3
i,3f4,3f4,3b8
c,3f5,3f6,3b5
c,3f7,3f8,3f8
i,3f9,3f9,3c3
c,3fa,3fb,3fb
c,400,401,435
i,402,402,452
i,403,403,433
i,404,406,454
i,407,407,456
i,408,40b,458
i,40c,40c,43a
i,40d,40d,438
i,40e,40e,443
i,40f,40f,45f
i,410,418,430
i,419,419,438
i,41a,42f,43a
i,430,438,430
i,439,439,69
i,43a,44f,43a
c,450,451,435
i,452,452,452
i,453,453,433
i,454,456,454
i,457,457,456
i,458,45b,458
i,45c,45c,43a
i,45d,45d,438
i,45e,45e,443
i,45f,45f,45f
c,460,461,461
c,462,463,463
c,464,465,465
c,466,467,467
c,468,469,469
c,46a,46b,46b
c,46c,46d,46d
c,46e,46f,46f
c,470,471,471
c,472,473,473
c,474,477,475
c,478,479,479
c,47a,47b,47b
c,47c,47d,47d
c,47e,47f,47f
c,480,481,481
c,48a,48b,438
c,48c,48d,44c
c,48e,48f,440
c,490,495,433
c,496,497,436
c,498,499,437
c,49a,4a1,43a
c,4a2,4a5,43d
c,4a6,4a7,43f
c,4a8,4a9,4a9
c,4aa,4ab,441
c,4ac,4ad,442
c,4ae,4b1,443
c,4b2,4b3,445
c,4b4,4b5,4b5
c,4b6,4b9,447
c,4ba,4bb,4bb
c,4bc,4bf,4bd
i,4c0,4c0,4cf
c,4c1,4c2,436
c,4c3,4c4,43a
c,4c5,4c6,43b
c,4c7,4ca,43d
c,4cb,4cc,447
c,4cd,4ce,43c
i,4cf,4cf,4cf
c,4d0,4d3,430
c,4d4,4d5,e6
c,4d6,4d7,435
c,4d8,4db,4d9
c,4dc,4dd,436
c,4de,4df,437
c,4e0,4e1,4e1
c,4e2,4e5,438
c,4e6,4eb,43e
c,4ec,4ed,44d
c,4ee,4f3,443
c,4f4,4f5,447
c,4f6,4f7,433
c,4f8,4f9,44b
c,4fa,4fb,433
c,4fc,4ff,445
i,531,556,561
i,561,587,561
i,5d0,5f2,5d0
i,621,621,621
c,622,623,627
i,624,624,648
i,625,625,627
i,626,626,64a
i,627,63a,627
i,641,64a,641
i,660,669,660
i,66e,66f,66e
i,671,6bf,671
i,6c0,6c0,6d5
c,6c1,6c2,6c1
i,6c3,6d2,6c3
i,6d3,6d3,6d2
i,6d5,6d5,6d5
i,6ee,6fc,6ee
i,6ff,6ff,6ff
i,750,76d,750
i,904,928,904
i,929,929,928
i,92a,930,92a
i,931,931,930
i,932,933,932
i,934,934,933
i,935,939,935
i,958,95a,915
i,95b,95b,91c
i,95c,95d,921
i,95e,95e,92b
i,95f,95f,92f
i,960,961,960
i,966,96f,966
i,97b,97f,97b
i,985,990,985
i,993,9b0,993
i,9b2,9b2,9b2
i,9b6,9b9,9b6
i,9ce,9ce,9ce
i,9dc,9dd,9a1
i,9df,9df,9af
i,9e0,9e1,9e0
i,9e6,9ef,9e6
c,9f0,9f1,9ac
i,a05,a0a,a05
i,a0f,a10,a0f
i,a13,a28,a13
i,a2a,a30,a2a
c,a32,a33,a32
i,a35,a35,a35
i,a36,a36,a38
i,a38,a39,a38
i,a59,a5a,a16
i,a5b,a5b,a1c
i,a5c,a5c,a5c
i,a5e,a5e,a2b
i,a66,a6f,a66
i,a85,a8c,a85
i,a8f,a90,a8f
i,a93,ab0,a93
i,ab2,ab3,ab2
i,ab5,ab9,ab5
i,ae0,ae1,ae0
i,ae6,aef,ae6
i,b85,b8a,b85
i,b8e,b90,b8e
i,b92,b93,b92
i,b94,b94,b92
i,b95,b95,b95
i,b99,b9a,b99
i,b9c,b9c,b9c
i,b9e,b9f,b9e
i,ba3,ba4,ba3
i,ba8,baa,ba8
i,bae,bb9,bae
i,be6,bef,be6
i,c85,c8c,c85
i,c8e,c90,c8e
i,c92,ca8,c92
i,caa,cb3,caa
i,cb5,cb9,cb5
i,ce0,ce1,ce0
i,ce6,cef,ce6
i,d05,d0c,d05
i,d0e,d10,d0e
i,d12,d28,d12
i,d2a,d39,d2a
i,d60,d61,d60
i,d66,d6f,d66
i,e01,e30,e01
i,e32,e33,e32
i,e40,e46,e40
i,e50,e5b,e50
i,10a0,10c5,2d00
i,10d0,10fa,10d0
i,10fc,10fc,10dc
i,1100,1159,1100
i,1161,11a2,1161
i,11a8,11f9,11a8
i,16d2,16d2,62
i,1900,191c,1900
i,1930,1938,1930
i,1946,194f,1946
c,1d01,1d02,e6
i,1d03,1d03,62
i,1d05,1d05,64
c,1d07,1d08,65
i,1d09,1d0f,69
c,1d10,1d13,6f
c,1d16,1d17,6f
i,1d18,1d18,70
c,1d19,1d1a,72
i,1d1b,1d1c,74
c,1d1d,1d1e,75
i,1d1f,1d1f,6d
i,1d20,1d21,76
i,1d22,1d22,7a
i,1d2c,1d2c,61
i,1d2d,1d2d,e6
c,1d2e,1d2f,62
i,1d30,1d31,64
i,1d32,1d32,65
i,1d33,1d3a,67
i,1d3b,1d3c,6e
i,1d3e,1d3e,70
i,1d3f,1d3f,72
i,1d40,1d41,74
i,1d42,1d42,77
c,1d43,1d44,61
i,1d46,1d46,e6
i,1d47,1d47,62
i,1d48,1d49,64
c,1d4b,1d4c,65
i,1d4d,1d4d,67
i,1d4e,1d4e,69
i,1d4f,1d4f,6b
i,1d50,1d50,6d
c,1d52,1d55,6f
i,1d56,1d56,70
i,1d57,1d58,74
i,1d59,1d59,75
i,1d5a,1d5a,6d
i,1d5b,1d5b,76
i,1d62,1d62,69
i,1d63,1d63,72
i,1d64,1d65,75
i,1d6c,1d6c,62
i,1d6d,1d6d,64
i,1d6e,1d6e,66
i,1d6f,1d70,6d
i,1d71,1d71,70
c,1d72,1d73,72
i,1d74,1d75,73
i,1d76,1d76,7a
i,1d77,1d77,67
i,1d79,1d79,67
i,1d7b,1d7b,69
i,1d7d,1d7d,70
i,1d7e,1d7e,75
i,1d80,1d80,62
i,1d81,1d81,64
i,1d82,1d83,66
i,1d84,1d87,6b
i,1d88,1d88,70
i,1d89,1d8a,72
i,1d8c,1d8c,76
i,1d8d,1d8d,78
i,1d8e,1d8e,7a
i,1d8f,1d8f,61
i,1d91,1d92,64
c,1d93,1d94,65
i,1d96,1d96,69
i,1d97,1d97,6f
i,1d99,1d99,75
c,1d9c,1d9d,63
i,1d9f,1da0,65
i,1da1,1da1,6a
i,1da2,1da4,67
c,1da6,1da7,69
i,1da8,1da8,6a
c,1da9,1dab,6c
c,1dac,1dad,6d
c,1dae,1db0,6e
i,1db1,1db1,6f
i,1db3,1db3,73
i,1db5,1db6,74
i,1db8,1db9,75
i,1dba,1dba,76
c,1dbb,1dbd,7a
i,1dca,1dca,72
c,1e00,1e01,61
c,1e02,1e07,62
c,1e08,1e09,63
c,1e0a,1e13,64
c,1e14,1e1d,65
c,1e1e,1e1f,66
c,1e20,1e21,67
c,1e22,1e2b,68
c,1e2c,1e2f,69
c,1e30,1e35,6b
c,1e36,1e3d,6c
c,1e3e,1e43,6d
c,1e44,1e4b,6e
c,1e4c,1e53,6f
c,1e54,1e57,70
c,1e58,1e5f,72
c,1e60,1e69,73
c,1e6a,1e71,74
c,1e72,1e7b,75
c,1e7c,1e7f,76
c,1e80,1e89,77
c,1e8a,1e8d,78
c,1e8e,1e8f,79
c,1e90,1e95,7a
i,1e96,1e96,68
i,1e97,1e97,74
i,1e98,1e98,77
i,1e99,1e99,79
i,1e9a,1e9a,61
i,1e9b,1e9b,73
c,1ea0,1eb7,61
c,1eb8,1ec7,65
c,1ec8,1ecb,69
c,1ecc,1ee3,6f
c,1ee4,1ef1,75
c,1ef2,1ef9,79
c,1f00,1f0f,3b1
c,1f10,1f15,3b5
c,1f18,1f1d,3b5
c,1f20,1f2f,3b7
c,1f30,1f3f,3b9
c,1f40,1f45,3bf
c,1f48,1f4d,3bf
c,1f50,1f57,3c5
i,1f59,1f59,3c5
i,1f5b,1f5b,3c5
i,1f5d,1f5d,3c5
i,1f5f,1f5f,3c5
c,1f60,1f6f,3c9
c,1f70,1f71,3b1
c,1f72,1f73,3b5
c,1f74,1f75,3b7
c,1f76,1f77,3b9
c,1f78,1f79,3bf
c,1f7a,1f7b,3c5
c,1f7c,1f7d,3c9
c,1f80,1f8f,3b1
c,1f90,1f9f,3b7
c,1fa0,1faf,3c9
c,1fb0,1fb4,3b1
c,1fb6,1fbc,3b1
c,1fc2,1fc4,3b7
c,1fc6,1fc7,3b7
c,1fc8,1fc9,3b5
c,1fca,1fcc,3b7
c,1fd0,1fd3,3b9
c,1fd6,1fdb,3b9
c,1fe0,1fe3,3c5
c,1fe4,1fe5,3c1
c,1fe6,1feb,3c5
i,1fec,1fec,3c1
c,1ff2,1ff4,3c9
c,1ff6,1ff7,3c9
c,1ff8,1ff9,3bf
c,1ffa,1ffc,3c9
i,2071,2071,69
i,207f,207f,6e
i,2090,2090,61
i,2091,2091,65
i,2092,2092,6f
i,2093,2093,78
i,210c,210c,68
i,2111,2111,69
i,211c,211c,72
i,2128,2128,7a
i,212d,212d,63
i,2184,2184,63
c,2c60,2c62,6c
i,2c63,2c63,70
i,2c64,2c64,72
i,2c65,2c65,61
i,2c66,2c66,74
c,2c67,2c68,68
c,2c69,2c6a,6b
c,2c6b,2c6c,7a
i,2c74,2c74,76
c,2c75,2c76,68
c,2c80,2c81,2c81
c,2c82,2c83,2c83
c,2c84,2c85,2c85
c,2c86,2c87,2c87
c,2c88,2c89,2c89
c,2c8a,2c8b,2c8b
c,2c8c,2c8d,2c8d
c,2c8e,2c8f,2c8f
c,2c90,2c91,2c91
c,2c92,2c93,2c93
c,2c94,2c95,2c95
c,2c96,2c97,2c97
c,2c98,2c99,2c99
c,2c9a,2c9b,2c9b
c,2c9c,2c9d,2c9d
c,2c9e,2c9f,2c9f
c,2ca0,2ca1,2ca1
c,2ca2,2ca3,2ca3
c,2ca4,2ca5,2ca5
c,2ca6,2ca7,2ca7
c,2ca8,2ca9,2ca9
c,2caa,2cab,2cab
c,2cac,2cad,2cad
c,2cae,2caf,2caf
c,2cb0,2cb1,2cb1
c,2cb2,2cb3,2cb3
c,2cb4,2cb5,2cb5
c,2cb6,2cb7,2cb7
c,2cb8,2cb9,2cb9
c,2cba,2cbb,2cbb
c,2cbc,2cbd,2cbd
c,2cbe,2cbf,2cbf
c,2cc0,2cc1,2cc1
c,2cc2,2cc3,2cc3
c,2cc4,2cc5,2cc5
c,2cc6,2cc7,2cc7
c,2cc8,2cc9,2cc9
c,2cca,2ccb,2ccb
c,2ccc,2ccd,2ccd
c,2cce,2ccf,2ccf
c,2cd0,2cd1,2cd1
c,2cd2,2cd3,2cd3
c,2cd4,2cd5,2cd5
c,2cd6,2cd7,2cd7
c,2cd8,2cd9,2cd9
c,2cda,2cdb,2cdb
c,2cdc,2cdd,2cdd
c,2cde,2cdf,2cdf
c,2ce0,2ce1,2ce1
c,2ce2,2ce3,2ce3
i,2d00,2d25,2d00
i,2f00,2f00,4e00
i,2f01,2f01,4e28
i,2f02,2f02,4e36
i,2f03,2f03,4e3f
i,2f04,2f04,4e59
i,2f05,2f05,4e85
i,2f06,2f06,4e8c
i,2f07,2f07,4ea0
i,2f08,2f08,4eba
i,2f09,2f09,513f
i,2f0a,2f0a,5165
i,2f0b,2f0b,516b
i,2f0c,2f0c,5182
i,2f0d,2f0d,5196
i,2f0e,2f0e,51ab
i,2f0f,2f0f,51e0
i,2f10,2f10,51f5
i,2f11,2f11,5200
i,2f12,2f12,529b
i,2f13,2f13,52f9
i,2f14,2f14,5315
i,2f15,2f15,531a
i,2f16,2f16,5338
i,2f17,2f17,5341
i,2f18,2f18,535c
i,2f19,2f19,5369
i,2f1a,2f1a,5382
i,2f1b,2f1b,53b6
i,2f1c,2f1c,53c8
i,2f1d,2f1d,53e3
i,2f1e,2f1e,56d7
i,2f1f,2f1f,571f
i,2f20,2f20,58eb
i,2f21,2f21,5902
i,2f22,2f22,590a
i,2f23,2f23,5915
i,2f24,2f24,5927
i,2f25,2f25,5973
i,2f26,2f26,5b50
i,2f27,2f27,5b80
i,2f28,2f28,5bf8
i,2f29,2f29,5c0f
i,2f2a,2f2a,5c22
i,2f2b,2f2b,5c38
i,2f2c,2f2c,5c6e
i,2f2d,2f2d,5c71
i,2f2e,2f2e,5ddb
i,2f2f,2f2f,5de5
i,2f30,2f30,5df1
i,2f31,2f31,5dfe
i,2f32,2f32,5e72
i,2f33,2f33,5e7a
i,2f34,2f34,5e7f
i,2f35,2f35,5ef4
i,2f36,2f36,5efe
i,2f37,2f37,5f0b
i,2f38,2f38,5f13
i,2f39,2f39,5f50
i,2f3a,2f3a,5f61
i,2f3b,2f3b,5f73
i,2f3c,2f3c,5fc3
i,2f3d,2f3d,6208
i,2f3e,2f3e,6236
i,2f3f,2f3f,624b
i,2f40,2f40,652f
i,2f41,2f41,6534
i,2f42,2f42,6587
i,2f43,2f43,6597
i,2f44,2f44,65a4
i,2f45,2f45,65b9
i,2f46,2f46,65e0
i,2f47,2f47,65e5
i,2f48,2f48,66f0
i,2f49,2f49,6708
i,2f4a,2f4a,6728
i,2f4b,2f4b,6b20
i,2f4c,2f4c,6b62
i,2f4d,2f4d,6b79
i,2f4e,2f4e,6bb3
i,2f4f,2f4f,6bcb
i,2f50,2f50,6bd4
i,2f51,2f51,6bdb
i,2f52,2f52,6c0f
i,2f53,2f53,6c14
i,2f54,2f54,6c34
i,2f55,2f55,706b
i,2f56,2f56,722a
i,2f57,2f57,7236
i,2f58,2f58,723b
i,2f59,2f59,723f
i,2f5a,2f5a,7247
i,2f5b,2f5b,7259
i,2f5c,2f5c,725b
i,2f5d,2f5d,72ac
i,2f5e,2f5e,7384
i,2f5f,2f5f,7389
i,2f60,2f60,74dc
i,2f61,2f61,74e6
i,2f62,2f62,7518
i,2f63,2f63,751f
i,2f64,2f64,7528
i,2f65,2f65,7530
i,2f66,2f66,758b
i,2f67,2f67,7592
i,2f68,2f68,7676
i,2f69,2f69,767d
i,2f6a,2f6a,76ae
i,2f6b,2f6b,76bf
i,2f6c,2f6c,76ee
i,2f6d,2f6d,77db
i,2f6e,2f6e,77e2
i,2f6f,2f6f,77f3
i,2f70,2f70,793a
i,2f71,2f71,79b8
i,2f72,2f72,79be
i,2f73,2f73,7a74
i,2f74,2f74,7acb
i,2f75,2f75,7af9
i,2f76,2f76,7c73
i,2f77,2f77,7cf8
i,2f78,2f78,7f36
i,2f79,2f79,7f51
i,2f7a,2f7a,7f8a
i,2f7b,2f7b,7fbd
i,2f7c,2f7c,8001
i,2f7d,2f7d,800c
i,2f7e,2f7e,8012
i,2f7f,2f7f,8033
i,2f80,2f80,807f
i,2f81,2f81,8089
i,2f82,2f82,81e3
i,2f83,2f83,81ea
i,2f84,2f84,81f3
i,2f85,2f85,81fc
i,2f86,2f86,820c
i,2f87,2f87,821b
i,2f88,2f88,821f
i,2f89,2f89,826e
i,2f8a,2f8a,8272
i,2f8b,2f8b,8278
i,2f8c,2f8c,864d
i,2f8d,2f8d,866b
i,2f8e,2f8e,8840
i,2f8f,2f8f,884c
i,2f90,2f90,8863
i,2f91,2f91,897e
i,2f92,2f92,898b
i,2f93,2f93,89d2
i,2f94,2f94,8a00
i,2f95,2f95,8c37
i,2f96,2f96,8c46
i,2f97,2f97,8c55
i,2f98,2f98,8c78
i,2f99,2f99,8c9d
i,2f9a,2f9a,8d64
i,2f9b,2f9b,8d70
i,2f9c,2f9c,8db3
i,2f9d,2f9d,8eab
i,2f9e,2f9e,8eca
i,2f9f,2f9f,8f9b
i,2fa0,2fa0,8fb0
i,2fa1,2fa1,8fb5
i,2fa2,2fa2,9091
i,2fa3,2fa3,9149
i,2fa4,2fa4,91c6
i,2fa5,2fa5,91cc
i,2fa6,2fa6,91d1
i,2fa7,2fa7,9577
i,2fa8,2fa8,9580
i,2fa9,2fa9,961c
i,2faa,2faa,96b6
i,2fab,2fab,96b9
i,2fac,2fac,96e8
i,2fad,2fad,9751
i,2fae,2fae,975e
i,2faf,2faf,9762
i,2fb0,2fb0,9769
i,2fb1,2fb1,97cb
i,2fb2,2fb2,97ed
i,2fb3,2fb3,97f3
i,2fb4,2fb4,9801
i,2fb5,2fb5,98a8
i,2fb6,2fb6,98db
i,2fb7,2fb7,98df
i,2fb8,2fb8,9996
i,2fb9,2fb9,9999
i,2fba,2fba,99ac
i,2fbb,2fbb,9aa8
i,2fbc,2fbc,9ad8
i,2fbd,2fbd,9adf
i,2fbe,2fbe,9b25
i,2fbf,2fbf,9b2f
i,2fc0,2fc0,9b32
i,2fc1,2fc1,9b3c
i,2fc2,2fc2,9b5a
i,2fc3,2fc3,9ce5
i,2fc4,2fc4,9e75
i,2fc5,2fc5,9e7f
i,2fc6,2fc6,9ea5
i,2fc7,2fc7,9ebb
i,2fc8,2fc8,9ec3
i,2fc9,2fc9,9ecd
i,2fca,2fca,9ed1
i,2fcb,2fcb,9ef9
i,2fcc,2fcc,9efd
i,2fcd,2fcd,9f0e
i,2fce,2fce,9f13
i,2fcf,2fcf,9f20
i,2fd0,2fd0,9f3b
i,2fd1,2fd1,9f4a
i,2fd2,2fd2,9f52
i,2fd3,2fd3,9f8d
i,2fd4,2fd4,9f9c
i,2fd5,2fd5,9fa0
c,3041,3042,3041
c,3043,3044,3043
c,3045,3046,3045
c,3047,3048,3047
c,3049,304a,3049
c,304b,304c,304b
c,304d,304e,304d
c,304f,3050,304f
c,3051,3052,3051
c,3053,3054,3053
c,3055,3056,3055
c,3057,3058,3057
c,3059,305a,3059
c,305b,305c,305b
c,305d,305e,305d
c,305f,3060,305f
c,3061,3062,3061
c,3063,3065,3063
c,3066,3067,3066
c,3068,3069,3068
i,306a,306f,306a
c,3070,3071,306f
c,3072,3074,3072
c,3075,3077,3075
c,3078,307a,3078
c,307b,307d,307b
i,307e,3083,307e
i,3084,3084,3083
c,3085,3086,3085
c,3087,3088,3087
i,3089,308e,3089
i,308f,308f,308e
i,3090,3093,3090
i,3094,3094,3046
i,3095,3095,304b
i,3096,3096,3051
c,30a1,30a2,30a1
c,30a3,30a4,30a3
c,30a5,30a6,30a5
c,30a7,30a8,30a7
c,30a9,30aa,30a9
i,30ab,30ab,30f5
i,30ac,30ac,30ab
c,30ad,30ae,30ad
c,30af,30b0,30af
i,30b1,30b1,30f6
i,30b2,30b2,30b1
c,30b3,30b4,30b3
c,30b5,30b6,30b5
i,30b7,30b7,31f1
i,30b8,30b8,30b7
i,30b9,30b9,31f2
i,30ba,30ba,30b9
c,30bb,30bc,30bb
c,30bd,30be,30bd
c,30bf,30c0,30bf
c,30c1,30c2,30c1
i,30c3,30c4,30c3
i,30c5,30c5,30c4
c,30c6,30c7,30c6
i,30c8,30c8,31f3
i,30c9,30c9,30c8
i,30ca,30cb,30ca
i,30cc,30cc,31f4
i,30cd,30ce,30cd
i,30cf,30cf,31f5
c,30d0,30d1,30cf
i,30d2,30d2,31f6
c,30d3,30d4,30d2
i,30d5,30d5,31f7
c,30d6,30d7,30d5
i,30d8,30d8,31f8
c,30d9,30da,30d8
i,30db,30db,31f9
c,30dc,30dd,30db
i,30de,30df,30de
i,30e0,30e0,31fa
i,30e1,30e3,30e1
i,30e4,30e4,30e3
c,30e5,30e6,30e5
c,30e7,30e8,30e7
i,30e9,30ed,31fb
c,30ee,30ef,30ee
i,30f0,30f3,30f0
i,30f4,30f4,30a6
i,30f5,30f6,30f5
i,30f7,30fa,30ef
i,3105,312c,3105
i,3131,3132,1100
i,3133,3133,11aa
i,3134,3134,1102
i,3135,3136,11ac
i,3137,3139,1103
i,313a,313f,11b0
i,3140,3140,111a
i,3141,3143,1106
i,3144,3144,1121
i,3145,314e,1109
i,314f,3163,1161
i,3165,3166,1114
i,3167,3168,11c7
i,3169,3169,11cc
i,316a,316a,11ce
i,316b,316b,11d3
i,316c,316c,11d7
i,316d,316d,11d9
i,316e,316e,111c
i,316f,316f,11dd
i,3170,3170,11df
i,3171,3172,111d
i,3173,3173,1120
i,3174,3175,1122
i,3176,3176,1127
i,3177,3177,1129
i,3178,317c,112b
i,317d,317d,1132
i,317e,317e,1136
i,317f,317f,1140
i,3180,3180,1147
i,3181,3181,114c
i,3182,3183,11f1
i,3184,3186,1157
i,3187,3188,1184
i,3189,3189,1188
i,318a,318b,1191
i,318c,318c,1194
i,318d,318d,119e
i,318e,318e,11a1
i,31a0,31b7,31a0
i,31f0,31ff,31f0
i,3400,4db5,3400
i,4e00,9fbb,4e00
i,a000,a48c,a000
i,a490,a490,a408
i,a491,a491,a1b9
i,a492,a4c6,a492
i,ac00,d7a3,ac00
i,f900,f900,8c48
i,f901,f901,66f4
i,f902,f902,8eca
i,f903,f903,8cc8
i,f904,f904,6ed1
i,f905,f905,4e32
i,f906,f906,53e5
c,f907,f908,9f9c
i,f909,f909,5951
i,f90a,f90a,91d1
i,f90b,f90b,5587
i,f90c,f90c,5948
i,f90d,f90d,61f6
i,f90e,f90e,7669
i,f90f,f90f,7f85
i,f910,f910,863f
i,f911,f911,87ba
i,f912,f912,88f8
i,f913,f913,908f
i,f914,f914,6a02
i,f915,f915,6d1b
i,f916,f916,70d9
i,f917,f917,73de
i,f918,f918,843d
i,f919,f919,916a
i,f91a,f91a,99f1
i,f91b,f91b,4e82
i,f91c,f91c,5375
i,f91d,f91d,6b04
i,f91e,f91e,721b
i,f91f,f91f,862d
i,f920,f920,9e1e
i,f921,f921,5d50
i,f922,f922,6feb
i,f923,f923,85cd
i,f924,f924,8964
i,f925,f925,62c9
i,f926,f926,81d8
i,f927,f927,881f
i,f928,f928,5eca
i,f929,f929,6717
i,f92a,f92a,6d6a
i,f92b,f92b,72fc
i,f92c,f92c,90ce
i,f92d,f92d,4f86
i,f92e,f92e,51b7
i,f92f,f92f,52de
i,f930,f930,64c4
i,f931,f931,6ad3
i,f932,f932,7210
i,f933,f933,76e7
i,f934,f934,8001
i,f935,f935,8606
i,f936,f936,865c
i,f937,f937,8def
i,f938,f938,9732
i,f939,f939,9b6f
i,f93a,f93a,9dfa
i,f93b,f93b,788c
i,f93c,f93c,797f
i,f93d,f93d,7da0
i,f93e,f93e,83c9
i,f93f,f93f,9304
i,f940,f940,9e7f
i,f941,f941,8ad6
i,f942,f942,58df
i,f943,f943,5f04
i,f944,f944,7c60
i,f945,f945,807e
i,f946,f946,7262
i,f947,f947,78ca
i,f948,f948,8cc2
i,f949,f949,96f7
i,f94a,f94a,58d8
i,f94b,f94b,5c62
i,f94c,f94c,6a13
i,f94d,f94d,6dda
i,f94e,f94e,6f0f
i,f94f,f94f,7d2f
i,f950,f950,7e37
i,f951,f951,964b
i,f952,f952,52d2
i,f953,f953,808b
i,f954,f954,51dc
i,f955,f955,51cc
i,f956,f956,7a1c
i,f957,f957,7dbe
i,f958,f958,83f1
i,f959,f959,9675
i,f95a,f95a,8b80
i,f95b,f95b,62cf
i,f95c,f95c,6a02
i,f95d,f95d,8afe
i,f95e,f95e,4e39
i,f95f,f95f,5be7
i,f960,f960,6012
i,f961,f961,7387
i,f962,f962,7570
i,f963,f963,5317
i,f964,f964,78fb
i,f965,f965,4fbf
i,f966,f966,5fa9
i,f967,f967,4e0d
i,f968,f968,6ccc
i,f969,f969,6578
i,f96a,f96a,7d22
i,f96b,f96b,53c3
i,f96c,f96c,585e
i,f96d,f96d,7701
i,f96e,f96e,8449
i,f96f,f96f,8aaa
i,f970,f970,6bba
i,f971,f971,8fb0
i,f972,f972,6c88
i,f973,f973,62fe
i,f974,f974,82e5
i,f975,f975,63a0
i,f976,f976,7565
i,f977,f977,4eae
i,f978,f978,5169
i,f979,f979,51c9
i,f97a,f97a,6881
i,f97b,f97b,7ce7
i,f97c,f97c,826f
i,f97d,f97d,8ad2
i,f97e,f97e,91cf
i,f97f,f97f,52f5
i,f980,f980,5442
i,f981,f981,5973
i,f982,f982,5eec
i,f983,f983,65c5
i,f984,f984,6ffe
i,f985,f985,792a
i,f986,f986,95ad
i,f987,f987,9a6a
i,f988,f988,9e97
i,f989,f989,9ece
i,f98a,f98a,529b
i,f98b,f98b,66c6
i,f98c,f98c,6b77
i,f98d,f98d,8f62
i,f98e,f98e,5e74
i,f98f,f98f,6190
i,f990,f990,6200
i,f991,f991,649a
i,f992,f992,6f23
i,f993,f993,7149
i,f994,f994,7489
i,f995,f995,79ca
i,f996,f996,7df4
i,f997,f997,806f
i,f998,f998,8f26
i,f999,f999,84ee
i,f99a,f99a,9023
i,f99b,f99b,934a
i,f99c,f99c,5217
i,f99d,f99d,52a3
i,f99e,f99e,54bd
i,f99f,f99f,70c8
i,f9a0,f9a0,88c2
i,f9a1,f9a1,8aaa
i,f9a2,f9a2,5ec9
i,f9a3,f9a3,5ff5
i,f9a4,f9a4,637b
i,f9a5,f9a5,6bae
i,f9a6,f9a6,7c3e
i,f9a7,f9a7,7375
i,f9a8,f9a8,4ee4
i,f9a9,f9a9,56f9
i,f9aa,f9aa,5be7
i,f9ab,f9ab,5dba
i,f9ac,f9ac,601c
i,f9ad,f9ad,73b2
i,f9ae,f9ae,7469
i,f9af,f9af,7f9a
i,f9b0,f9b0,8046
i,f9b1,f9b1,9234
i,f9b2,f9b2,96f6
i,f9b3,f9b3,9748
i,f9b4,f9b4,9818
i,f9b5,f9b5,4f8b
i,f9b6,f9b6,79ae
i,f9b7,f9b7,91b4
i,f9b8,f9b8,96b8
i,f9b9,f9b9,60e1
i,f9ba,f9ba,4e86
i,f9bb,f9bb,50da
i,f9bc,f9bc,5bee
i,f9bd,f9bd,5c3f
i,f9be,f9be,6599
i,f9bf,f9bf,6a02
i,f9c0,f9c0,71ce
i,f9c1,f9c1,7642
i,f9c2,f9c2,84fc
i,f9c3,f9c3,907c
i,f9c4,f9c4,9f8d
i,f9c5,f9c5,6688
i,f9c6,f9c6,962e
i,f9c7,f9c7,5289
i,f9c8,f9c8,677b
i,f9c9,f9c9,67f3
i,f9ca,f9ca,6d41
i,f9cb,f9cb,6e9c
i,f9cc,f9cc,7409
i,f9cd,f9cd,7559
i,f9ce,f9ce,786b
i,f9cf,f9cf,7d10
i,f9d0,f9d0,985e
i,f9d1,f9d1,516d
i,f9d2,f9d2,622e
i,f9d3,f9d3,9678
i,f9d4,f9d4,502b
i,f9d5,f9d5,5d19
i,f9d6,f9d6,6dea
i,f9d7,f9d7,8f2a
i,f9d8,f9d8,5f8b
i,f9d9,f9d9,6144
i,f9da,f9da,6817
i,f9db,f9db,7387
i,f9dc,f9dc,9686
i,f9dd,f9dd,5229
i,f9de,f9de,540f
i,f9df,f9df,5c65
i,f9e0,f9e0,6613
i,f9e1,f9e1,674e
i,f9e2,f9e2,68a8
i,f9e3,f9e3,6ce5
i,f9e4,f9e4,7406
i,f9e5,f9e5,75e2
i,f9e6,f9e6,7f79
i,f9e7,f9e7,88cf
i,f9e8,f9e8,88e1
i,f9e9,f9e9,91cc
i,f9ea,f9ea,96e2
i,f9eb,f9eb,533f
i,f9ec,f9ec,6eba
i,f9ed,f9ed,541d
i,f9ee,f9ee,71d0
i,f9ef,f9ef,7498
i,f9f0,f9f0,85fa
i,f9f1,f9f1,96a3
i,f9f2,f9f2,9c57
i,f9f3,f9f3,9e9f
i,f9f4,f9f4,6797
i,f9f5,f9f5,6dcb
i,f9f6,f9f6,81e8
i,f9f7,f9f7,7acb
i,f9f8,f9f8,7b20
i,f9f9,f9f9,7c92
i,f9fa,f9fa,72c0
i,f9fb,f9fb,7099
i,f9fc,f9fc,8b58
i,f9fd,f9fd,4ec0
i,f9fe,f9fe,8336
i,f9ff,f9ff,523a
i,fa00,fa00,5207
i,fa01,fa01,5ea6
i,fa02,fa02,62d3
i,fa03,fa03,7cd6
i,fa04,fa04,5b85
i,fa05,fa05,6d1e
i,fa06,fa06,66b4
i,fa07,fa07,8f3b
i,fa08,fa08,884c
i,fa09,fa09,964d
i,fa0a,fa0a,898b
i,fa0b,fa0b,5ed3
i,fa0c,fa0c,5140
i,fa0d,fa0d,55c0
i,fa0e,fa0f,fa0e
i,fa10,fa10,585a
i,fa11,fa11,fa11
i,fa12,fa12,6674
i,fa13,fa14,fa13
i,fa15,fa15,51de
i,fa16,fa16,732a
i,fa17,fa17,76ca
i,fa18,fa18,793c
i,fa19,fa19,795e
i,fa1a,fa1a,7965
i,fa1b,fa1b,798f
i,fa1c,fa1c,9756
i,fa1d,fa1d,7cbe
i,fa1e,fa1e,7fbd
i,fa1f,fa1f,fa1f
i,fa20,fa20,8612
i,fa21,fa21,fa21
i,fa22,fa22,8af8
i,fa23,fa24,fa23
i,fa25,fa25,9038
i,fa26,fa26,90fd
i,fa27,fa29,fa27
i,fa2a,fa2a,98ef
i,fa2b,fa2b,98fc
i,fa2c,fa2c,9928
i,fa2d,fa2d,9db4
i,fa30,fa30,4fae
i,fa31,fa31,50e7
i,fa32,fa32,514d
i,fa33,fa33,52c9
i,fa34,fa34,52e4
i,fa35,fa35,5351
i,fa36,fa36,559d
i,fa37,fa37,5606
i,fa38,fa38,5668
i,fa39,fa39,5840
i,fa3a,fa3a,58a8
i,fa3b,fa3b,5c64
i,fa3c,fa3c,5c6e
i,fa3d,fa3d,6094
i,fa3e,fa3e,6168
i,fa3f,fa3f,618e
i,fa40,fa40,61f2
i,fa41,fa41,654f
i,fa42,fa42,65e2
i,fa43,fa43,6691
i,fa44,fa44,6885
i,fa45,fa45,6d77
i,fa46,fa46,6e1a
i,fa47,fa47,6f22
i,fa48,fa48,716e
i,fa49,fa49,722b
i,fa4a,fa4a,7422
i,fa4b,fa4b,7891
i,fa4c,fa4c,793e
i,fa4d,fa4d,7949
i,fa4e,fa4e,7948
i,fa4f,fa4f,7950
i,fa50,fa50,7956
i,fa51,fa51,795d
i,fa52,fa53,798d
i,fa54,fa54,7a40
i,fa55,fa55,7a81
i,fa56,fa56,7bc0
i,fa57,fa57,7df4
i,fa58,fa58,7e09
i,fa59,fa59,7e41
i,fa5a,fa5a,7f72
i,fa5b,fa5b,8005
i,fa5c,fa5c,81ed
c,fa5d,fa5e,8279
i,fa5f,fa5f,8457
i,fa60,fa60,8910
i,fa61,fa61,8996
i,fa62,fa62,8b01
i,fa63,fa63,8b39
i,fa64,fa64,8cd3
i,fa65,fa65,8d08
i,fa66,fa66,8fb6
i,fa67,fa67,9038
i,fa68,fa68,96e3
i,fa69,fa69,97ff
i,fa6a,fa6a,983b
i,fa70,fa70,4e26
i,fa71,fa71,51b5
i,fa72,fa72,5168
i,fa73,fa73,4f80
i,fa74,fa74,5145
i,fa75,fa75,5180
i,fa76,fa76,52c7
i,fa77,fa77,52fa
i,fa78,fa78,559d
i,fa79,fa79,5555
i,fa7a,fa7a,5599
i,fa7b,fa7b,55e2
i,fa7c,fa7c,585a
i,fa7d,fa7d,58b3
i,fa7e,fa7e,5944
i,fa7f,fa7f,5954
i,fa80,fa80,5a62
i,fa81,fa81,5b28
i,fa82,fa82,5ed2
i,fa83,fa83,5ed9
i,fa84,fa84,5f69
i,fa85,fa85,5fad
i,fa86,fa86,60d8
i,fa87,fa87,614e
i,fa88,fa88,6108
i,fa89,fa89,618e
i,fa8a,fa8a,6160
i,fa8b,fa8b,61f2
i,fa8c,fa8c,6234
i,fa8d,fa8d,63c4
i,fa8e,fa8e,641c
i,fa8f,fa8f,6452
i,fa90,fa90,6556
i,fa91,fa91,6674
i,fa92,fa92,6717
i,fa93,fa93,671b
i,fa94,fa94,6756
i,fa95,fa95,6b79
i,fa96,fa96,6bba
i,fa97,fa97,6d41
i,fa98,fa98,6edb
i,fa99,fa99,6ecb
i,fa9a,fa9a,6f22
i,fa9b,fa9b,701e
i,fa9c,fa9c,716e
i,fa9d,fa9d,77a7
i,fa9e,fa9e,7235
i,fa9f,fa9f,72af
i,faa0,faa0,732a
i,faa1,faa1,7471
i,faa2,faa2,7506
i,faa3,faa3,753b
i,faa4,faa4,761d
i,faa5,faa5,761f
i,faa6,faa6,76ca
i,faa7,faa7,76db
i,faa8,faa8,76f4
i,faa9,faa9,774a
i,faaa,faaa,7740
i,faab,faab,78cc
i,faac,faac,7ab1
i,faad,faad,7bc0
i,faae,faae,7c7b
i,faaf,faaf,7d5b
i,fab0,fab0,7df4
i,fab1,fab1,7f3e
i,fab2,fab2,8005
i,fab3,fab3,8352
i,fab4,fab4,83ef
i,fab5,fab5,8779
i,fab6,fab6,8941
i,fab7,fab7,8986
i,fab8,fab8,8996
i,fab9,fab9,8abf
i,faba,faba,8af8
i,fabb,fabb,8acb
i,fabc,fabc,8b01
i,fabd,fabd,8afe
i,fabe,fabe,8aed
i,fabf,fabf,8b39
i,fac0,fac0,8b8a
i,fac1,fac1,8d08
i,fac2,fac2,8f38
i,fac3,fac3,9072
i,fac4,fac4,9199
i,fac5,fac5,9276
i,fac6,fac6,967c
i,fac7,fac7,96e3
i,fac8,fac8,9756
i,fac9,fac9,97db
i,faca,faca,97ff
i,facb,facb,980b
i,facc,facc,983b
i,facd,facd,9b12
i,face,face,9f9c
i,facf,facf,2284a
i,fad0,fad0,22844
i,fad1,fad1,233d5
i,fad2,fad2,3b9d
i,fad3,fad3,4018
i,fad4,fad4,4039
i,fad5,fad5,25249
i,fad6,fad6,25cd0
i,fad7,fad7,27ed3
i,fad8,fad8,9f43
i,fad9,fad9,9f8e
i,fb1d,fb1d,5d9
i,fb1f,fb1f,5f2
i,fb20,fb20,5e2
i,fb21,fb21,5d0
i,fb22,fb23,5d3
i,fb24,fb26,5db
i,fb27,fb27,5e8
i,fb28,fb28,5ea
c,fb2a,fb2d,5e9
c,fb2e,fb30,5d0
i,fb31,fb36,5d1
i,fb38,fb3c,5d8
i,fb3e,fb3e,5de
i,fb40,fb41,5e0
i,fb43,fb44,5e3
i,fb46,fb4a,5e6
i,fb4b,fb4b,5d5
i,fb4c,fb4c,5d1
i,fb4d,fb4d,5db
i,fb4e,fb4e,5e4
i,fb4f,fb4f,5d0
c,fb50,fb51,671
c,fb52,fb54,67b
i,fb55,fb55,fb55
c,fb56,fb58,67e
i,fb59,fb59,fb59
c,fb5a,fb5c,680
i,fb5d,fb5d,fb5d
c,fb5e,fb60,67a
i,fb61,fb61,fb61
c,fb62,fb64,67f
i,fb65,fb65,fb65
c,fb66,fb68,679
i,fb69,fb69,fb69
c,fb6a,fb6c,6a4
i,fb6d,fb6d,fb6d
c,fb6e,fb70,6a6
i,fb71,fb71,fb71
c,fb72,fb74,684
i,fb75,fb75,fb75
c,fb76,fb78,683
i,fb79,fb79,fb79
c,fb7a,fb7c,686
i,fb7d,fb7d,fb7d
c,fb7e,fb80,687
i,fb81,fb81,fb81
c,fb82,fb83,68d
c,fb84,fb85,68c
c,fb86,fb87,68e
c,fb88,fb89,688
c,fb8a,fb8b,698
c,fb8c,fb8d,691
c,fb8e,fb90,6a9
i,fb91,fb91,fb91
c,fb92,fb94,6af
i,fb95,fb95,fb95
c,fb96,fb98,6b3
i,fb99,fb99,fb99
c,fb9a,fb9c,6b1
i,fb9d,fb9d,fb9d
c,fb9e,fb9f,6ba
c,fba0,fba2,6bb
i,fba3,fba3,fba3
c,fba4,fba5,6c0
c,fba6,fba8,6c1
i,fba9,fba9,fba9
c,fbaa,fbac,6be
i,fbad,fbad,fbad
c,fbae,fbaf,6d2
c,fbb0,fbb1,6d3
c,fbd3,fbd5,6ad
i,fbd6,fbd6,fbd6
c,fbd7,fbd8,6c7
c,fbd9,fbda,6c6
c,fbdb,fbdc,6c8
i,fbdd,fbdd,677
c,fbde,fbdf,6cb
c,fbe0,fbe1,6c5
c,fbe2,fbe3,6c9
c,fbe4,fbe6,6d0
i,fbe7,fbe7,fbe7
i,fbe8,fbe8,649
i,fbe9,fbe9,fbe9
c,fbfc,fbfe,6cc
i,fbff,fbff,fbff
i,ff10,ff19,30
i,ff21,ff3a,61
i,ff41,ff5a,61
i,ff66,ff66,30f2
i,ff67,ff67,30a1
i,ff68,ff68,30a3
i,ff69,ff69,30a5
i,ff6a,ff6a,30a7
i,ff6b,ff6b,30a9
i,ff6c,ff6c,30e3
i,ff6d,ff6d,30e5
i,ff6e,ff6e,30e7
i,ff6f,ff6f,30c3
i,ff71,ff71,30a1
i,ff72,ff72,30a3
i,ff73,ff73,30a5
i,ff74,ff74,30a7
i,ff75,ff75,30a9
i,ff76,ff76,30ab
i,ff77,ff77,30ad
i,ff78,ff78,30af
i,ff79,ff79,30b1
i,ff7a,ff7a,30b3
i,ff7b,ff7b,30b5
i,ff7c,ff7c,30b7
i,ff7d,ff7d,30b9
i,ff7e,ff7e,30bb
i,ff7f,ff7f,30bd
i,ff80,ff80,30bf
i,ff81,ff81,30c1
i,ff82,ff82,30c3
i,ff83,ff83,30c6
i,ff84,ff84,30c8
i,ff85,ff8a,30ca
i,ff8b,ff8b,30d2
i,ff8c,ff8c,30d5
i,ff8d,ff8d,30d8
i,ff8e,ff8e,30db
i,ff8f,ff94,30de
i,ff95,ff95,30e5
i,ff96,ff96,30e7
i,ff97,ff9b,30e9
i,ff9c,ff9c,30ef
i,ff9d,ff9d,30f3
i,ffa0,ffa0,3164
i,ffa1,ffbe,3131
i,ffc2,ffc7,314f
i,ffca,ffcf,3155
i,ffd2,ffd7,315b
i,ffda,ffdc,3161
i,10300,10300,61
i,10309,10309,69
i,1030f,1030f,6f
i,10316,10316,75
i,20000,2a6d6,20000
i,2f800,2f800,4e3d
i,2f801,2f801,4e38
i,2f802,2f802,4e41
i,2f803,2f803,20122
i,2f804,2f804,4f60
i,2f805,2f805,4fae
i,2f806,2f806,4fbb
i,2f807,2f807,5002
i,2f808,2f808,507a
i,2f809,2f809,5099
i,2f80a,2f80a,50e7
i,2f80b,2f80b,50cf
i,2f80c,2f80c,349e
i,2f80d,2f80d,2063a
i,2f80e,2f80e,514d
i,2f80f,2f80f,5154
i,2f810,2f810,5164
i,2f811,2f811,5177
i,2f812,2f812,2051c
i,2f813,2f813,34b9
i,2f814,2f814,5167
i,2f815,2f815,518d
i,2f816,2f816,2054b
i,2f817,2f817,5197
i,2f818,2f818,51a4
i,2f819,2f819,4ecc
i,2f81a,2f81a,51ac
i,2f81b,2f81b,51b5
i,2f81c,2f81c,291df
i,2f81d,2f81d,51f5
i,2f81e,2f81e,5203
i,2f81f,2f81f,34df
i,2f820,2f820,523b
i,2f821,2f821,5246
i,2f822,2f822,5272
i,2f823,2f823,5277
i,2f824,2f824,3515
i,2f825,2f825,52c7
i,2f826,2f826,52c9
i,2f827,2f827,52e4
i,2f828,2f828,52fa
i,2f829,2f82a,5305
i,2f82b,2f82b,5317
i,2f82c,2f82c,5349
i,2f82d,2f82d,5351
i,2f82e,2f82e,535a
i,2f82f,2f82f,5373
i,2f830,2f830,537d
c,2f831,2f833,537f
i,2f834,2f834,20a2c
i,2f835,2f835,7070
i,2f836,2f836,53ca
i,2f837,2f837,53df
i,2f838,2f838,20b63
i,2f839,2f839,53eb
i,2f83a,2f83a,53f1
i,2f83b,2f83b,5406
i,2f83c,2f83c,549e
i,2f83d,2f83d,5438
i,2f83e,2f83e,5448
i,2f83f,2f83f,5468
i,2f840,2f840,54a2
i,2f841,2f841,54f6
i,2f842,2f842,5510
i,2f843,2f843,5553
i,2f844,2f844,5563
c,2f845,2f846,5584
i,2f847,2f847,5599
i,2f848,2f848,55ab
i,2f849,2f849,55b3
i,2f84a,2f84a,55c2
i,2f84b,2f84b,5716
i,2f84c,2f84c,5606
i,2f84d,2f84d,5717
i,2f84e,2f84e,5651
i,2f84f,2f84f,5674
i,2f850,2f850,5207
i,2f851,2f851,58ee
i,2f852,2f852,57ce
i,2f853,2f853,57f4
i,2f854,2f854,580d
i,2f855,2f855,578b
i,2f856,2f856,5832
i,2f857,2f857,5831
i,2f858,2f858,58ac
i,2f859,2f859,214e4
i,2f85a,2f85a,58f2
i,2f85b,2f85b,58f7
i,2f85c,2f85c,5906
i,2f85d,2f85d,591a
i,2f85e,2f85e,5922
i,2f85f,2f85f,5962
i,2f860,2f860,216a8
i,2f861,2f861,216ea
i,2f862,2f862,59ec
i,2f863,2f863,5a1b
i,2f864,2f864,5a27
i,2f865,2f865,59d8
i,2f866,2f866,5a66
i,2f867,2f867,36ee
i,2f868,2f868,36fc
i,2f869,2f869,5b08
c,2f86a,2f86b,5b3e
i,2f86c,2f86c,219c8
i,2f86d,2f86d,5bc3
i,2f86e,2f86e,5bd8
i,2f86f,2f86f,5be7
i,2f870,2f870,5bf3
i,2f871,2f871,21b18
i,2f872,2f872,5bff
i,2f873,2f873,5c06
i,2f874,2f874,5f53
i,2f875,2f875,5c22
i,2f876,2f876,3781
i,2f877,2f877,5c60
i,2f878,2f878,5c6e
i,2f879,2f879,5cc0
i,2f87a,2f87a,5c8d
i,2f87b,2f87b,21de4
i,2f87c,2f87c,5d43
i,2f87d,2f87d,21de6
i,2f87e,2f87e,5d6e
i,2f87f,2f87f,5d6b
i,2f880,2f880,5d7c
i,2f881,2f882,5de1
i,2f883,2f883,382f
i,2f884,2f884,5dfd
i,2f885,2f885,5e28
i,2f886,2f886,5e3d
i,2f887,2f887,5e69
i,2f888,2f888,3862
i,2f889,2f889,22183
i,2f88a,2f88a,387c
i,2f88b,2f88b,5eb0
i,2f88c,2f88c,5eb3
i,2f88d,2f88d,5eb6
i,2f88e,2f88e,5eca
i,2f88f,2f88f,2a392
i,2f890,2f890,5efe
c,2f891,2f892,22331
i,2f893,2f893,8201
c,2f894,2f895,5f22
i,2f896,2f896,38c7
i,2f897,2f897,232b8
i,2f898,2f898,261da
i,2f899,2f899,5f62
i,2f89a,2f89a,5f6b
i,2f89b,2f89b,38e3
i,2f89c,2f89c,5f9a
i,2f89d,2f89d,5fcd
i,2f89e,2f89e,5fd7
i,2f89f,2f89f,5ff9
i,2f8a0,2f8a0,6081
i,2f8a1,2f8a1,393a
i,2f8a2,2f8a2,391c
i,2f8a3,2f8a3,6094
i,2f8a4,2f8a4,226d4
i,2f8a5,2f8a5,60c7
i,2f8a6,2f8a6,6148
i,2f8a7,2f8a7,614c
i,2f8a8,2f8a8,614e
i,2f8a9,2f8a9,614c
i,2f8aa,2f8aa,617a
i,2f8ab,2f8ab,618e
i,2f8ac,2f8ac,61b2
i,2f8ad,2f8ad,61a4
i,2f8ae,2f8ae,61af
i,2f8af,2f8af,61de
i,2f8b0,2f8b0,61f2
i,2f8b1,2f8b1,61f6
i,2f8b2,2f8b2,6210
i,2f8b3,2f8b3,621b
i,2f8b4,2f8b4,625d
i,2f8b5,2f8b5,62b1
i,2f8b6,2f8b6,62d4
i,2f8b7,2f8b7,6350
i,2f8b8,2f8b8,22b0c
i,2f8b9,2f8b9,633d
i,2f8ba,2f8ba,62fc
i,2f8bb,2f8bb,6368
i,2f8bc,2f8bc,6383
i,2f8bd,2f8bd,63e4
i,2f8be,2f8be,22bf1
i,2f8bf,2f8bf,6422
i,2f8c0,2f8c0,63c5
i,2f8c1,2f8c1,63a9
i,2f8c2,2f8c2,3a2e
i,2f8c3,2f8c3,6469
i,2f8c4,2f8c4,647e
i,2f8c5,2f8c5,649d
i,2f8c6,2f8c6,6477
i,2f8c7,2f8c7,3a6c
i,2f8c8,2f8c8,654f
i,2f8c9,2f8c9,656c
i,2f8ca,2f8ca,2300a
i,2f8cb,2f8cb,65e3
i,2f8cc,2f8cc,66f8
i,2f8cd,2f8cd,6649
i,2f8ce,2f8ce,3b19
i,2f8cf,2f8cf,6691
i,2f8d0,2f8d0,3b08
i,2f8d1,2f8d1,3ae4
i,2f8d2,2f8d2,5192
i,2f8d3,2f8d3,5195
i,2f8d4,2f8d4,6700
i,2f8d5,2f8d5,669c
i,2f8d6,2f8d6,80ad
i,2f8d7,2f8d7,43d9
i,2f8d8,2f8d8,6717
i,2f8d9,2f8d9,671b
i,2f8da,2f8da,6721
i,2f8db,2f8db,675e
i,2f8dc,2f8dc,6753
i,2f8dd,2f8dd,233c3
i,2f8de,2f8de,3b49
i,2f8df,2f8df,67fa
i,2f8e0,2f8e0,6785
i,2f8e1,2f8e1,6852
i,2f8e2,2f8e2,6885
i,2f8e3,2f8e3,2346d
i,2f8e4,2f8e4,688e
i,2f8e5,2f8e5,681f
i,2f8e6,2f8e6,6914
i,2f8e7,2f8e7,3b9d
i,2f8e8,2f8e8,6942
i,2f8e9,2f8e9,69a3
i,2f8ea,2f8ea,69ea
i,2f8eb,2f8eb,6aa8
i,2f8ec,2f8ec,236a3
i,2f8ed,2f8ed,6adb
i,2f8ee,2f8ee,3c18
i,2f8ef,2f8ef,6b21
i,2f8f0,2f8f0,238a7
i,2f8f1,2f8f1,6b54
i,2f8f2,2f8f2,3c4e
i,2f8f3,2f8f3,6b72
i,2f8f4,2f8f4,6b9f
i,2f8f5,2f8f6,6bba
i,2f8f7,2f8f7,23a8d
i,2f8f8,2f8f8,21d0b
i,2f8f9,2f8f9,23afa
i,2f8fa,2f8fa,6c4e
i,2f8fb,2f8fb,23cbc
i,2f8fc,2f8fc,6cbf
i,2f8fd,2f8fd,6ccd
i,2f8fe,2f8fe,6c67
i,2f8ff,2f8ff,6d16
i,2f900,2f900,6d3e
i,2f901,2f901,6d77
i,2f902,2f902,6d41
i,2f903,2f903,6d69
i,2f904,2f904,6d78
i,2f905,2f905,6d85
i,2f906,2f906,23d1e
i,2f907,2f907,6d34
i,2f908,2f908,6e2f
i,2f909,2f909,6e6e
i,2f90a,2f90a,3d33
i,2f90b,2f90b,6ecb
i,2f90c,2f90c,6ec7
i,2f90d,2f90d,23ed1
i,2f90e,2f90e,6df9
i,2f90f,2f90f,6f6e
i,2f910,2f910,23f5e
i,2f911,2f911,23f8e
i,2f912,2f912,6fc6
i,2f913,2f913,7039
i,2f914,2f914,701e
i,2f915,2f915,701b
i,2f916,2f916,3d96
i,2f917,2f917,704a
i,2f918,2f918,707d
i,2f919,2f919,7077
i,2f91a,2f91a,70ad
i,2f91b,2f91b,20525
i,2f91c,2f91c,7145
i,2f91d,2f91d,24263
i,2f91e,2f91e,719c
i,2f91f,2f91f,243ab
i,2f920,2f920,7228
i,2f921,2f921,7235
i,2f922,2f922,7250
i,2f923,2f923,24608
i,2f924,2f924,7280
i,2f925,2f925,7295
i,2f926,2f926,24735
i,2f927,2f927,24814
i,2f928,2f928,737a
i,2f929,2f929,738b
i,2f92a,2f92a,3eac
i,2f92b,2f92b,73a5
c,2f92c,2f92d,3eb8
i,2f92e,2f92e,7447
i,2f92f,2f92f,745c
i,2f930,2f930,7471
i,2f931,2f931,7485
i,2f932,2f932,74ca
i,2f933,2f933,3f1b
i,2f934,2f934,7524
i,2f935,2f935,24c36
i,2f936,2f936,753e
i,2f937,2f937,24c92
i,2f938,2f938,7570
i,2f939,2f939,2219f
i,2f93a,2f93a,7610
i,2f93b,2f93b,24fa1
i,2f93c,2f93c,24fb8
i,2f93d,2f93d,25044
i,2f93e,2f93e,3ffc
i,2f93f,2f93f,4008
i,2f940,2f940,76f4
i,2f941,2f941,250f3
i,2f942,2f942,250f2
i,2f943,2f943,25119
i,2f944,2f944,25133
i,2f945,2f946,771e
i,2f947,2f947,771f
i,2f948,2f948,774a
i,2f949,2f949,4039
i,2f94a,2f94a,778b
i,2f94b,2f94b,4046
i,2f94c,2f94c,4096
i,2f94d,2f94d,2541d
i,2f94e,2f94e,784e
i,2f94f,2f94f,788c
i,2f950,2f950,78cc
i,2f951,2f951,40e3
i,2f952,2f952,25626
i,2f953,2f953,7956
i,2f954,2f954,2569a
i,2f955,2f955,256c5
i,2f956,2f956,798f
i,2f957,2f957,79eb
i,2f958,2f958,412f
i,2f959,2f959,7a40
i,2f95a,2f95a,7a4a
i,2f95b,2f95b,7a4f
i,2f95c,2f95c,2597c
c,2f95d,2f95e,25aa7
i,2f95f,2f95f,7aee
i,2f960,2f960,4202
i,2f961,2f961,25bab
i,2f962,2f962,7bc6
i,2f963,2f963,7bc9
i,2f964,2f964,4227
i,2f965,2f965,25c80
i,2f966,2f966,7cd2
i,2f967,2f967,42a0
i,2f968,2f968,7ce8
i,2f969,2f969,7ce3
i,2f96a,2f96a,7d00
i,2f96b,2f96b,25f86
i,2f96c,2f96c,7d63
i,2f96d,2f96d,4301
i,2f96e,2f96e,7dc7
i,2f96f,2f96f,7e02
i,2f970,2f970,7e45
i,2f971,2f971,4334
i,2f972,2f972,26228
i,2f973,2f973,26247
i,2f974,2f974,4359
i,2f975,2f975,262d9
i,2f976,2f976,7f7a
i,2f977,2f977,2633e
i,2f978,2f978,7f95
i,2f979,2f979,7ffa
i,2f97a,2f97a,8005
i,2f97b,2f97b,264da
i,2f97c,2f97c,26523
i,2f97d,2f97d,8060
i,2f97e,2f97e,265a8
i,2f97f,2f97f,8070
i,2f980,2f980,2335f
i,2f981,2f981,43d5
i,2f982,2f982,80b2
i,2f983,2f983,8103
i,2f984,2f984,440b
i,2f985,2f985,813e
i,2f986,2f986,5ab5
i,2f987,2f987,267a7
i,2f988,2f988,267b5
i,2f989,2f989,23393
i,2f98a,2f98a,2339c
i,2f98b,2f98b,8201
i,2f98c,2f98c,8204
i,2f98d,2f98d,8f9e
i,2f98e,2f98e,446b
i,2f98f,2f98f,8291
i,2f990,2f990,828b
i,2f991,2f991,829d
i,2f992,2f992,52b3
i,2f993,2f993,82b1
i,2f994,2f994,82b3
i,2f995,2f995,82bd
i,2f996,2f996,82e6
i,2f997,2f997,26b3c
i,2f998,2f998,82e5
i,2f999,2f999,831d
i,2f99a,2f99a,8363
i,2f99b,2f99b,83ad
i,2f99c,2f99c,8323
i,2f99d,2f99d,83bd
i,2f99e,2f99e,83e7
i,2f99f,2f99f,8457
i,2f9a0,2f9a0,8353
i,2f9a1,2f9a1,83ca
i,2f9a2,2f9a2,83cc
i,2f9a3,2f9a3,83dc
i,2f9a4,2f9a4,26c36
i,2f9a5,2f9a5,26d6b
i,2f9a6,2f9a6,26cd5
i,2f9a7,2f9a7,452b
i,2f9a8,2f9a8,84f1
i,2f9a9,2f9a9,84f3
i,2f9aa,2f9aa,8516
i,2f9ab,2f9ab,273ca
i,2f9ac,2f9ac,8564
i,2f9ad,2f9ad,26f2c
i,2f9ae,2f9ae,455d
i,2f9af,2f9af,4561
i,2f9b0,2f9b0,26fb1
i,2f9b1,2f9b1,270d2
i,2f9b2,2f9b2,456b
i,2f9b3,2f9b3,8650
i,2f9b4,2f9b4,865c
i,2f9b5,2f9b5,8667
i,2f9b6,2f9b6,8669
i,2f9b7,2f9b7,86a9
i,2f9b8,2f9b8,8688
i,2f9b9,2f9b9,870e
i,2f9ba,2f9ba,86e2
i,2f9bb,2f9bb,8779
i,2f9bc,2f9bc,8728
i,2f9bd,2f9bd,876b
i,2f9be,2f9be,8786
i,2f9bf,2f9bf,45d7
i,2f9c0,2f9c0,87e1
i,2f9c1,2f9c1,8801
i,2f9c2,2f9c2,45f9
i,2f9c3,2f9c3,8860
i,2f9c4,2f9c4,8863
i,2f9c5,2f9c5,27667
i,2f9c6,2f9c6,88d7
i,2f9c7,2f9c7,88de
i,2f9c8,2f9c8,4635
i,2f9c9,2f9c9,88fa
i,2f9ca,2f9ca,34bb
i,2f9cb,2f9cb,278ae
i,2f9cc,2f9cc,27966
i,2f9cd,2f9cd,46be
i,2f9ce,2f9ce,46c7
i,2f9cf,2f9cf,8aa0
i,2f9d0,2f9d0,8aed
i,2f9d1,2f9d1,8b8a
i,2f9d2,2f9d2,8c55
i,2f9d3,2f9d3,27ca8
i,2f9d4,2f9d4,8cab
i,2f9d5,2f9d5,8cc1
i,2f9d6,2f9d6,8d1b
i,2f9d7,2f9d7,8d77
i,2f9d8,2f9d8,27f2f
i,2f9d9,2f9d9,20804
i,2f9da,2f9da,8dcb
i,2f9db,2f9db,8dbc
i,2f9dc,2f9dc,8df0
i,2f9dd,2f9dd,208de
i,2f9de,2f9de,8ed4
i,2f9df,2f9df,8f38
i,2f9e0,2f9e0,285d2
i,2f9e1,2f9e1,285ed
i,2f9e2,2f9e2,9094
i,2f9e3,2f9e3,90f1
i,2f9e4,2f9e4,9111
i,2f9e5,2f9e5,2872e
i,2f9e6,2f9e6,911b
i,2f9e7,2f9e7,9238
i,2f9e8,2f9e9,92d7
i,2f9ea,2f9ea,927c
i,2f9eb,2f9eb,93f9
i,2f9ec,2f9ec,9415
i,2f9ed,2f9ed,28bfa
i,2f9ee,2f9ee,958b
i,2f9ef,2f9ef,4995
i,2f9f0,2f9f0,95b7
i,2f9f1,2f9f1,28d77
i,2f9f2,2f9f2,49e6
i,2f9f3,2f9f3,96c3
i,2f9f4,2f9f4,5db2
i,2f9f5,2f9f5,9723
i,2f9f6,2f9f6,29145
i,2f9f7,2f9f7,2921a
i,2f9f8,2f9f8,4a6e
i,2f9f9,2f9f9,4a76
i,2f9fa,2f9fa,97e0
i,2f9fb,2f9fb,2940a
i,2f9fc,2f9fc,4ab2
i,2f9fd,2f9fd,29496
c,2f9fe,2f9ff,980b
i,2fa00,2fa00,9829
i,2fa01,2fa01,295b6
i,2fa02,2fa02,98e2
i,2fa03,2fa03,4b33
i,2fa04,2fa04,9929
i,2fa05,2fa05,99a7
i,2fa06,2fa06,99c2
i,2fa07,2fa07,99fe
i,2fa08,2fa08,4bce
i,2fa09,2fa09,29b30
i,2fa0a,2fa0a,9b12
i,2fa0b,2fa0b,9c40
i,2fa0c,2fa0c,9cfd
i,2fa0d,2fa0d,4cce
i,2fa0e,2fa0e,4ced
i,2fa0f,2fa0f,9d67
i,2fa10,2fa10,2a0ce
i,2fa11,2fa11,4cf8
i,2fa12,2fa12,2a105
i,2fa13,2fa13,2a20e
i,2fa14,2fa14,2a291
i,2fa15,2fa15,9ebb
i,2fa16,2fa16,4d56
i,2fa17,2fa17,9ef9
i,2fa18,2fa18,9efe
i,2fa19,2fa19,9f05
i,2fa1a,2fa1a,9f0f
i,2fa1b,2fa1b,9f16
i,2fa1c,2fa1c,9f3b
i,2fa1d,2fa1d,2a600
"""

ACCENT_MAP_PAIRS = """\
48 h
49 i
4a j
4e n
50 p
53 s
54 t
57 w
59 y
69 i
6e n
70 p
73 s
c0 a
c1 a
c2 a
c3 a
c4 a
c5 a
c7 c
c8 e
c9 e
ca e
cb e
cc i
cd i
ce i
cf i
d1 n
d2 o
d3 o
d4 o
d5 o
d6 o
d8 o
d9 u
da u
db u
dc u
dd y
de t
df s
e0 a
e1 a
e2 a
e3 a
e4 a
e5 a
e7 c
e8 e
e9 e
ea e
eb e
ec i
ed i
ee i
ef i
f0 d
f1 n
f2 o
f3 o
f4 o
f5 o
f6 o
f8 o
f9 u
fa u
fb u
fc u
fd y
fe t
ff y
100 a
101 a
102 a
103 a
104 a
105 a
106 c
107 c
108 c
109 c
10a c
10b c
10c c
10d c
10e d
10f d
110 d
111 d
112 e
113 e
114 e
115 e
116 e
117 e
118 e
119 e
11a e
11b e
11c g
11d g
11e g
11f g
120 g
121 g
122 g
123 g
124 h
125 h
126 h
127 h
128 i
129 i
12a i
12b i
12c i
12d i
12e i
12f i
130 i
131 i
134 j
135 j
136 k
137 k
139 a
13a l
13b l
13c l
13d l
13e l
13f l
140 l
141 l
142 l
143 n
144 n
145 n
146 n
147 n
148 n
14c o
14d o
14e o
14f o
150 o
151 o
154 r
155 r
156 r
157 r
158 r
159 r
15a s
15b s
15c s
15d s
15e s
15f s
160 s
161 s
162 t
163 t
164 t
165 t
166 t
167 t
168 u
169 u
16a u
16b u
16c u
16d u
16e u
16f u
170 u
171 u
172 u
173 u
174 w
175 w
176 y
177 y
178 y
179 z
17a z
17b z
17c z
17d z
17e z
180 b
181 b
182 b
183 b
187 c
188 c
189 d
18a d
18b d
18c d
18e e
18f e
191 f
192 f
193 g
197 i
198 k
199 k
19a l
19d n
19e n
19f o
1a0 o
1a1 o
1a4 p
1a5 p
1ab t
1ac t
1ad t
1ae t
1af u
1b0 u
1b2 v
1b3 y
1b4 y
1b5 z
1b6 z
1ba z
1cd a
1ce a
1cf i
1d0 i
1d1 o
1d2 o
1d3 u
1d4 u
1d5 u
1d6 u
1d7 u
1d8 u
1d9 u
1da u
1db u
1dc u
1dd e
1de a
1df a
1e0 a
1e1 a
1e2 a
1e3 a
1e4 g
1e5 g
1e6 g
1e7 g
1e8 k
1e9 k
1ea o
1eb o
1ec o
1ed o
1ee z
1ef z
1f0 j
1f4 g
1f5 g
1f8 n
1f9 n
1fa a
1fb a
1fc a
1fd a
1fe o
1ff o
200 a
201 a
202 a
203 a
204 e
205 e
206 e
207 e
208 i
209 i
20a i
20b i
20c o
20d o
20e o
20f o
210 r
211 r
212 r
213 r
214 u
215 u
216 u
217 u
218 s
219 s
21a t
21b t
21e h
21f h
220 n
221 d
224 z
225 z
226 a
227 a
228 e
229 e
22a o
22b o
22c o
22d o
22e o
22f o
230 o
231 o
232 y
233 y
234 l
235 n
236 t
237 j
23a a
23b c
23c c
23d l
23e t
243 b
244 u
246 e
247 e
248 j
249 j
24a q
24b q
24c r
24d r
24e y
24f y
253 b
255 c
256 d
257 d
25a e
25d e
25f j
260 g
268 i
26b l
26c l
26d l
271 m
272 n
273 n
275 o
27c r
27d r
27e r
282 s
284 j
288 t
289 u
28b v
28f y
290 z
291 z
29d j
2a0 q
303 p
308 t
30a y
30c j
323 l
329 s
331 h
1d6c b
1d6d d
1d6e f
1d72 r
1d73 r
1d75 t
1e00 a
1e01 a
1e02 b
1e03 b
1e04 b
1e05 b
1e06 b
1e07 b
1e08 c
1e09 c
1e0a d
1e0b d
1e0c d
1e0d d
1e0e d
1e0f d
1e10 d
1e11 d
1e12 d
1e13 d
1e14 e
1e15 e
1e16 e
1e17 e
1e18 e
1e19 e
1e1a e
1e1b e
1e1c e
1e1d e
1e1e f
1e1f f
1e20 g
1e21 g
1e22 h
1e23 h
1e24 h
1e25 h
1e26 h
1e27 h
1e28 h
1e29 h
1e2a h
1e2b h
1e2c i
1e2d i
1e2e i
1e2f i
1e30 k
1e31 k
1e32 k
1e33 k
1e34 k
1e35 k
1e36 l
1e37 l
1e38 l
1e39 l
1e3a l
1e3b l
1e3c l
1e3d l
1e3e m
1e3f m
1e40 m
1e41 m
1e42 m
1e43 m
1e44 n
1e45 n
1e46 n
1e47 n
1e48 n
1e49 n
1e4a n
1e4b n
1e4c o
1e4d o
1e4e o
1e4f o
1e50 o
1e51 o
1e52 o
1e53 o
1e54 p
1e55 p
1e56 p
1e57 p
1e58 r
1e59 r
1e5a r
1e5b r
1e5c r
1e5d r
1e5e r
1e5f r
1e60 s
1e61 s
1e62 s
1e63 s
1e64 s
1e65 s
1e66 s
1e67 s
1e68 s
1e69 s
1e6a t
1e6b t
1e6c t
1e6d t
1e6e t
1e6f t
1e70 t
1e71 t
1e72 u
1e73 u
1e74 u
1e75 u
1e76 u
1e77 u
1e78 u
1e79 u
1e7a u
1e7b u
1e7c v
1e7d v
1e7e v
1e7f v
1e80 w
1e81 w
1e82 w
1e83 w
1e84 w
1e85 w
1e86 w
1e87 w
1e88 w
1e89 w
1e8a x
1e8b x
1e8c x
1e8d x
1e8e y
1e8f y
1e90 z
1e91 z
1e92 z
1e93 z
1e94 z
1e95 z
1e96 h
1e97 t
1e98 w
1e99 y
1e9a a
1e9b s
1ea0 a
1ea1 a
1ea2 a
1ea3 a
1ea4 a
1ea5 a
1ea6 a
1ea7 a
1ea8 a
1ea9 a
1eaa a
1eab a
1eac a
1ead a
1eae a
1eaf a
1eb0 a
1eb1 a
1eb2 a
1eb3 a
1eb4 a
1eb5 a
1eb6 a
1eb7 a
1eb8 e
1eb9 e
1eba e
1ebb e
1ebc e
1ebd e
1ebe e
1ebf e
1ec0 e
1ec1 e
1ec2 e
1ec3 e
1ec4 e
1ec5 e
1ec6 e
1ec7 e
1ec8 i
1ec9 i
1eca i
1ecb i
1ecc o
1ecd o
1ece o
1ecf o
1ed0 o
1ed1 o
1ed2 o
1ed3 o
1ed4 o
1ed5 o
1ed6 o
1ed7 o
1ed8 o
1ed9 o
1eda o
1edb o
1edc o
1edd o
1ede o
1edf o
1ee0 o
1ee1 o
1ee2 o
1ee3 o
1ee4 u
1ee5 u
1ee6 u
1ee7 u
1ee8 u
1ee9 u
1eea u
1eeb u
1eec u
1eed u
1eee u
1eef u
1ef0 u
1ef1 u
1ef2 y
1ef3 y
1ef4 y
1ef5 y
1ef6 y
1ef7 y
1ef8 y
1ef9 y
2c60 l
2c61 l
2c62 l
2c63 p
2c64 r
2c65 a
2c66 t
2c67 h
2c68 h
2c69 k
2c6a k
2c6b z
2c6c z
ff10 0
ff11 1
ff12 2
ff13 3
ff14 4
ff15 5
ff16 6
ff17 7
ff18 8
ff19 9
ff21 A
ff22 B
ff23 C
ff24 D
ff25 E
ff26 F
ff27 G
ff28 H
ff29 I
ff2a J
ff2b K
ff2c L
ff2d M
ff2e N
ff2f O
ff30 P
ff31 Q
ff32 R
ff33 S
ff34 T
ff35 U
ff36 V
ff37 W
ff38 X
ff39 Y
ff3a Z
ff41 a
ff42 b
ff43 c
ff44 d
ff45 e
ff46 f
ff47 g
ff48 h
ff49 i
ff4a j
ff4b k
ff4c l
ff4d m
ff4e n
ff4f o
ff50 p
ff51 q
ff52 r
ff53 s
ff54 t
ff55 u
ff56 v
ff57 w
ff58 x
ff59 y
ff5a z
"""
