"""UAX#14 Line_Break classes (LB1-resolved), GENERATED from the
system ICU UCHAR_LINE_BREAK property (tools/gen_uax14_data.py).
"""

CLASSES = ('AL', 'B2', 'BA', 'BB', 'BK', 'CB', 'CL', 'CM', 'CP', 'CR', 'EB', 'EM', 'EX', 'GL', 'H2', 'H3', 'HL', 'HY', 'ID', 'IN', 'IS', 'JL', 'JT', 'JV', 'LF', 'NL', 'NS', 'NU', 'OP', 'PO', 'PR', 'QU', 'RI', 'SP', 'SY', 'WJ', 'ZW', 'ZWJ')

# (start, end, class-id) half-open-free inclusive ranges, sorted
LB_STARTS = (
    0x0000,
    0x0009,
    0x000A,
    0x000B,
    0x000D,
    0x000E,
    0x0020,
    0x0021,
    0x0022,
    0x0023,
    0x0024,
    0x0025,
    0x0026,
    0x0027,
    0x0028,
    0x0029,
    0x002A,
    0x002B,
    0x002C,
    0x002D,
    0x002E,
    0x002F,
    0x0030,
    0x003A,
    0x003C,
    0x003F,
    0x0040,
    0x005B,
    0x005C,
    0x005D,
    0x005E,
    0x007B,
    0x007C,
    0x007D,
    0x007E,
    0x007F,
    0x0085,
    0x0086,
    0x00A0,
    0x00A1,
    0x00A2,
    0x00A3,
    0x00A6,
    0x00AB,
    0x00AC,
    0x00AD,
    0x00AE,
    0x00B0,
    0x00B1,
    0x00B2,
    0x00B4,
    0x00B5,
    0x00BB,
    0x00BC,
    0x00BF,
    0x00C0,
    0x02C8,
    0x02C9,
    0x02CC,
    0x02CD,
    0x02DF,
    0x02E0,
    0x0300,
    0x034F,
    0x0350,
    0x035C,
    0x0363,
    0x0370,
    0x037E,
    0x037F,
    0x0483,
    0x048A,
    0x0589,
    0x058A,
    0x058B,
    0x058F,
    0x0590,
    0x0591,
    0x05BE,
    0x05BF,
    0x05C0,
    0x05C1,
    0x05C3,
    0x05C4,
    0x05C6,
    0x05C7,
    0x05C8,
    0x05D0,
    0x05EB,
    0x05EF,
    0x05F3,
    0x0609,
    0x060C,
    0x060E,
    0x0610,
    0x061B,
    0x061C,
    0x061D,
    0x0620,
    0x064B,
    0x0660,
    0x066A,
    0x066B,
    0x066D,
    0x0670,
    0x0671,
    0x06D4,
    0x06D5,
    0x06D6,
    0x06DD,
    0x06DF,
    0x06E5,
    0x06E7,
    0x06E9,
    0x06EA,
    0x06EE,
    0x06F0,
    0x06FA,
    0x0711,
    0x0712,
    0x0730,
    0x074B,
    0x07A6,
    0x07B1,
    0x07C0,
    0x07CA,
    0x07EB,
    0x07F4,
    0x07F8,
    0x07F9,
    0x07FA,
    0x07FD,
    0x07FE,
    0x0800,
    0x0816,
    0x081A,
    0x081B,
    0x0824,
    0x0825,
    0x0828,
    0x0829,
    0x082E,
    0x0859,
    0x085C,
    0x0898,
    0x08A0,
    0x08CA,
    0x08E2,
    0x08E3,
    0x0904,
    0x093A,
    0x093D,
    0x093E,
    0x0950,
    0x0951,
    0x0958,
    0x0962,
    0x0964,
    0x0966,
    0x0970,
    0x0981,
    0x0984,
    0x09BC,
    0x09BD,
    0x09BE,
    0x09C5,
    0x09C7,
    0x09C9,
    0x09CB,
    0x09CE,
    0x09D7,
    0x09D8,
    0x09E2,
    0x09E4,
    0x09E6,
    0x09F0,
    0x09F2,
    0x09F4,
    0x09F9,
    0x09FA,
    0x09FB,
    0x09FC,
    0x09FE,
    0x09FF,
    0x0A01,
    0x0A04,
    0x0A3C,
    0x0A3D,
    0x0A3E,
    0x0A43,
    0x0A47,
    0x0A49,
    0x0A4B,
    0x0A4E,
    0x0A51,
    0x0A52,
    0x0A66,
    0x0A70,
    0x0A72,
    0x0A75,
    0x0A76,
    0x0A81,
    0x0A84,
    0x0ABC,
    0x0ABD,
    0x0ABE,
    0x0AC6,
    0x0AC7,
    0x0ACA,
    0x0ACB,
    0x0ACE,
    0x0AE2,
    0x0AE4,
    0x0AE6,
    0x0AF0,
    0x0AF1,
    0x0AF2,
    0x0AFA,
    0x0B00,
    0x0B01,
    0x0B04,
    0x0B3C,
    0x0B3D,
    0x0B3E,
    0x0B45,
    0x0B47,
    0x0B49,
    0x0B4B,
    0x0B4E,
    0x0B55,
    0x0B58,
    0x0B62,
    0x0B64,
    0x0B66,
    0x0B70,
    0x0B82,
    0x0B83,
    0x0BBE,
    0x0BC3,
    0x0BC6,
    0x0BC9,
    0x0BCA,
    0x0BCE,
    0x0BD7,
    0x0BD8,
    0x0BE6,
    0x0BF0,
    0x0BF9,
    0x0BFA,
    0x0C00,
    0x0C05,
    0x0C3C,
    0x0C3D,
    0x0C3E,
    0x0C45,
    0x0C46,
    0x0C49,
    0x0C4A,
    0x0C4E,
    0x0C55,
    0x0C57,
    0x0C62,
    0x0C64,
    0x0C66,
    0x0C70,
    0x0C77,
    0x0C78,
    0x0C81,
    0x0C84,
    0x0C85,
    0x0CBC,
    0x0CBD,
    0x0CBE,
    0x0CC5,
    0x0CC6,
    0x0CC9,
    0x0CCA,
    0x0CCE,
    0x0CD5,
    0x0CD7,
    0x0CE2,
    0x0CE4,
    0x0CE6,
    0x0CF0,
    0x0CF3,
    0x0CF4,
    0x0D00,
    0x0D04,
    0x0D3B,
    0x0D3D,
    0x0D3E,
    0x0D45,
    0x0D46,
    0x0D49,
    0x0D4A,
    0x0D4E,
    0x0D57,
    0x0D58,
    0x0D62,
    0x0D64,
    0x0D66,
    0x0D70,
    0x0D79,
    0x0D7A,
    0x0D81,
    0x0D84,
    0x0DCA,
    0x0DCB,
    0x0DCF,
    0x0DD5,
    0x0DD6,
    0x0DD7,
    0x0DD8,
    0x0DE0,
    0x0DE6,
    0x0DF0,
    0x0DF2,
    0x0DF4,
    0x0E31,
    0x0E32,
    0x0E34,
    0x0E3B,
    0x0E3F,
    0x0E40,
    0x0E47,
    0x0E4F,
    0x0E50,
    0x0E5A,
    0x0E5C,
    0x0EB1,
    0x0EB2,
    0x0EB4,
    0x0EBD,
    0x0EC8,
    0x0ECF,
    0x0ED0,
    0x0EDA,
    0x0F01,
    0x0F05,
    0x0F06,
    0x0F08,
    0x0F09,
    0x0F0B,
    0x0F0C,
    0x0F0D,
    0x0F12,
    0x0F13,
    0x0F14,
    0x0F15,
    0x0F18,
    0x0F1A,
    0x0F20,
    0x0F2A,
    0x0F34,
    0x0F35,
    0x0F36,
    0x0F37,
    0x0F38,
    0x0F39,
    0x0F3A,
    0x0F3B,
    0x0F3C,
    0x0F3D,
    0x0F3E,
    0x0F40,
    0x0F71,
    0x0F7F,
    0x0F80,
    0x0F85,
    0x0F86,
    0x0F88,
    0x0F8D,
    0x0F98,
    0x0F99,
    0x0FBD,
    0x0FBE,
    0x0FC0,
    0x0FC6,
    0x0FC7,
    0x0FD0,
    0x0FD2,
    0x0FD3,
    0x0FD4,
    0x0FD9,
    0x0FDB,
    0x102B,
    0x103F,
    0x1040,
    0x104A,
    0x104C,
    0x1056,
    0x105A,
    0x105E,
    0x1061,
    0x1062,
    0x1065,
    0x1067,
    0x106E,
    0x1071,
    0x1075,
    0x1082,
    0x108E,
    0x108F,
    0x1090,
    0x109A,
    0x109E,
    0x1100,
    0x1160,
    0x11A8,
    0x1200,
    0x135D,
    0x1360,
    0x1361,
    0x1362,
    0x1400,
    0x1401,
    0x1680,
    0x1681,
    0x169B,
    0x169C,
    0x169D,
    0x16EB,
    0x16EE,
    0x1712,
    0x1716,
    0x1732,
    0x1735,
    0x1737,
    0x1752,
    0x1754,
    0x1772,
    0x1774,
    0x17B4,
    0x17D4,
    0x17D6,
    0x17D7,
    0x17D8,
    0x17D9,
    0x17DA,
    0x17DB,
    0x17DC,
    0x17DD,
    0x17DE,
    0x17E0,
    0x17EA,
    0x1802,
    0x1804,
    0x1806,
    0x1807,
    0x1808,
    0x180A,
    0x180B,
    0x180E,
    0x180F,
    0x1810,
    0x181A,
    0x1885,
    0x1887,
    0x18A9,
    0x18AA,
    0x1920,
    0x192C,
    0x1930,
    0x193C,
    0x1944,
    0x1946,
    0x1950,
    0x19D0,
    0x19DA,
    0x1A17,
    0x1A1C,
    0x1A55,
    0x1A5F,
    0x1A60,
    0x1A7D,
    0x1A7F,
    0x1A80,
    0x1A8A,
    0x1A90,
    0x1A9A,
    0x1AB0,
    0x1ACF,
    0x1B00,
    0x1B05,
    0x1B34,
    0x1B45,
    0x1B50,
    0x1B5A,
    0x1B5C,
    0x1B5D,
    0x1B61,
    0x1B6B,
    0x1B74,
    0x1B7D,
    0x1B7F,
    0x1B80,
    0x1B83,
    0x1BA1,
    0x1BAE,
    0x1BB0,
    0x1BBA,
    0x1BE6,
    0x1BF4,
    0x1C24,
    0x1C38,
    0x1C3B,
    0x1C40,
    0x1C4A,
    0x1C50,
    0x1C5A,
    0x1C7E,
    0x1C80,
    0x1CD0,
    0x1CD3,
    0x1CD4,
    0x1CE9,
    0x1CED,
    0x1CEE,
    0x1CF4,
    0x1CF5,
    0x1CF7,
    0x1CFA,
    0x1DC0,
    0x1DCD,
    0x1DCE,
    0x1DFC,
    0x1DFD,
    0x1E00,
    0x1FFD,
    0x1FFE,
    0x2000,
    0x2007,
    0x2008,
    0x200B,
    0x200C,
    0x200D,
    0x200E,
    0x2010,
    0x2011,
    0x2012,
    0x2014,
    0x2015,
    0x2018,
    0x201A,
    0x201B,
    0x201E,
    0x201F,
    0x2020,
    0x2024,
    0x2027,
    0x2028,
    0x202A,
    0x202F,
    0x2030,
    0x2038,
    0x2039,
    0x203B,
    0x203C,
    0x203E,
    0x2044,
    0x2045,
    0x2046,
    0x2047,
    0x204A,
    0x2056,
    0x2057,
    0x2058,
    0x205C,
    0x205D,
    0x2060,
    0x2061,
    0x2066,
    0x2070,
    0x207D,
    0x207E,
    0x207F,
    0x208D,
    0x208E,
    0x208F,
    0x20A0,
    0x20A7,
    0x20A8,
    0x20B6,
    0x20B7,
    0x20BB,
    0x20BC,
    0x20BE,
    0x20BF,
    0x20C0,
    0x20C1,
    0x20D0,
    0x20F1,
    0x2103,
    0x2104,
    0x2109,
    0x210A,
    0x2116,
    0x2117,
    0x2212,
    0x2214,
    0x22EF,
    0x22F0,
    0x2308,
    0x2309,
    0x230A,
    0x230B,
    0x230C,
    0x231A,
    0x231C,
    0x2329,
    0x232A,
    0x232B,
    0x23F0,
    0x23F4,
    0x2600,
    0x2604,
    0x2614,
    0x2616,
    0x2618,
    0x2619,
    0x261A,
    0x261D,
    0x261E,
    0x2620,
    0x2639,
    0x263C,
    0x2668,
    0x2669,
    0x267F,
    0x2680,
    0x26BD,
    0x26C9,
    0x26CD,
    0x26CE,
    0x26CF,
    0x26D2,
    0x26D3,
    0x26D5,
    0x26D8,
    0x26DA,
    0x26DC,
    0x26DD,
    0x26DF,
    0x26E2,
    0x26EA,
    0x26EB,
    0x26F1,
    0x26F6,
    0x26F7,
    0x26F9,
    0x26FA,
    0x26FB,
    0x26FD,
    0x2705,
    0x2708,
    0x270A,
    0x270E,
    0x275B,
    0x2761,
    0x2762,
    0x2764,
    0x2765,
    0x2768,
    0x2769,
    0x276A,
    0x276B,
    0x276C,
    0x276D,
    0x276E,
    0x276F,
    0x2770,
    0x2771,
    0x2772,
    0x2773,
    0x2774,
    0x2775,
    0x2776,
    0x27C5,
    0x27C6,
    0x27C7,
    0x27E6,
    0x27E7,
    0x27E8,
    0x27E9,
    0x27EA,
    0x27EB,
    0x27EC,
    0x27ED,
    0x27EE,
    0x27EF,
    0x27F0,
    0x2983,
    0x2984,
    0x2985,
    0x2986,
    0x2987,
    0x2988,
    0x2989,
    0x298A,
    0x298B,
    0x298C,
    0x298D,
    0x298E,
    0x298F,
    0x2990,
    0x2991,
    0x2992,
    0x2993,
    0x2994,
    0x2995,
    0x2996,
    0x2997,
    0x2998,
    0x2999,
    0x29D8,
    0x29D9,
    0x29DA,
    0x29DB,
    0x29DC,
    0x29FC,
    0x29FD,
    0x29FE,
    0x2CEF,
    0x2CF2,
    0x2CF9,
    0x2CFA,
    0x2CFD,
    0x2CFE,
    0x2CFF,
    0x2D00,
    0x2D70,
    0x2D71,
    0x2D7F,
    0x2D80,
    0x2DE0,
    0x2E00,
    0x2E0E,
    0x2E16,
    0x2E17,
    0x2E18,
    0x2E19,
    0x2E1A,
    0x2E1C,
    0x2E1E,
    0x2E20,
    0x2E22,
    0x2E23,
    0x2E24,
    0x2E25,
    0x2E26,
    0x2E27,
    0x2E28,
    0x2E29,
    0x2E2A,
    0x2E2E,
    0x2E2F,
    0x2E30,
    0x2E32,
    0x2E33,
    0x2E35,
    0x2E3A,
    0x2E3C,
    0x2E3F,
    0x2E40,
    0x2E42,
    0x2E43,
    0x2E4B,
    0x2E4C,
    0x2E4D,
    0x2E4E,
    0x2E50,
    0x2E53,
    0x2E55,
    0x2E56,
    0x2E57,
    0x2E58,
    0x2E59,
    0x2E5A,
    0x2E5B,
    0x2E5C,
    0x2E5D,
    0x2E5E,
    0x2E80,
    0x2E9A,
    0x2E9B,
    0x2EF4,
    0x2F00,
    0x2FD6,
    0x2FF0,
    0x2FFC,
    0x3000,
    0x3001,
    0x3003,
    0x3005,
    0x3006,
    0x3008,
    0x3009,
    0x300A,
    0x300B,
    0x300C,
    0x300D,
    0x300E,
    0x300F,
    0x3010,
    0x3011,
    0x3012,
    0x3014,
    0x3015,
    0x3016,
    0x3017,
    0x3018,
    0x3019,
    0x301A,
    0x301B,
    0x301C,
    0x301D,
    0x301E,
    0x3020,
    0x302A,
    0x3030,
    0x3035,
    0x3036,
    0x303B,
    0x303D,
    0x3040,
    0x3041,
    0x3042,
    0x3043,
    0x3044,
    0x3045,
    0x3046,
    0x3047,
    0x3048,
    0x3049,
    0x304A,
    0x3063,
    0x3064,
    0x3083,
    0x3084,
    0x3085,
    0x3086,
    0x3087,
    0x3088,
    0x308E,
    0x308F,
    0x3095,
    0x3097,
    0x3099,
    0x309B,
    0x309F,
    0x30A0,
    0x30A2,
    0x30A3,
    0x30A4,
    0x30A5,
    0x30A6,
    0x30A7,
    0x30A8,
    0x30A9,
    0x30AA,
    0x30C3,
    0x30C4,
    0x30E3,
    0x30E4,
    0x30E5,
    0x30E6,
    0x30E7,
    0x30E8,
    0x30EE,
    0x30EF,
    0x30F5,
    0x30F7,
    0x30FB,
    0x30FF,
    0x3100,
    0x3105,
    0x3130,
    0x3131,
    0x318F,
    0x3190,
    0x31E4,
    0x31F0,
    0x3200,
    0x321F,
    0x3220,
    0x3248,
    0x3250,
    0x4DC0,
    0x4E00,
    0xA015,
    0xA016,
    0xA48D,
    0xA490,
    0xA4C7,
    0xA4FE,
    0xA500,
    0xA60D,
    0xA60E,
    0xA60F,
    0xA610,
    0xA620,
    0xA62A,
    0xA66F,
    0xA673,
    0xA674,
    0xA67E,
    0xA69E,
    0xA6A0,
    0xA6F0,
    0xA6F2,
    0xA6F3,
    0xA6F8,
    0xA802,
    0xA803,
    0xA806,
    0xA807,
    0xA80B,
    0xA80C,
    0xA823,
    0xA828,
    0xA82C,
    0xA82D,
    0xA838,
    0xA839,
    0xA874,
    0xA876,
    0xA878,
    0xA880,
    0xA882,
    0xA8B4,
    0xA8C6,
    0xA8CE,
    0xA8D0,
    0xA8DA,
    0xA8E0,
    0xA8F2,
    0xA8FC,
    0xA8FD,
    0xA8FF,
    0xA900,
    0xA90A,
    0xA926,
    0xA92E,
    0xA930,
    0xA947,
    0xA954,
    0xA960,
    0xA97D,
    0xA980,
    0xA984,
    0xA9B3,
    0xA9C1,
    0xA9C7,
    0xA9CA,
    0xA9D0,
    0xA9DA,
    0xA9E5,
    0xA9E6,
    0xA9F0,
    0xA9FA,
    0xAA29,
    0xAA37,
    0xAA43,
    0xAA44,
    0xAA4C,
    0xAA4E,
    0xAA50,
    0xAA5A,
    0xAA5D,
    0xAA60,
    0xAA7B,
    0xAA7E,
    0xAAB0,
    0xAAB1,
    0xAAB2,
    0xAAB5,
    0xAAB7,
    0xAAB9,
    0xAABE,
    0xAAC0,
    0xAAC1,
    0xAAC2,
    0xAAEB,
    0xAAF0,
    0xAAF2,
    0xAAF5,
    0xAAF7,
    0xABE3,
    0xABEB,
    0xABEC,
    0xABEE,
    0xABF0,
    0xABFA,
    0xAC00,
    0xAC01,
    0xAC1C,
    0xAC1D,
    0xAC38,
    0xAC39,
    0xAC54,
    0xAC55,
    0xAC70,
    0xAC71,
    0xAC8C,
    0xAC8D,
    0xACA8,
    0xACA9,
    0xACC4,
    0xACC5,
    0xACE0,
    0xACE1,
    0xACFC,
    0xACFD,
    0xAD18,
    0xAD19,
    0xAD34,
    0xAD35,
    0xAD50,
    0xAD51,
    0xAD6C,
    0xAD6D,
    0xAD88,
    0xAD89,
    0xADA4,
    0xADA5,
    0xADC0,
    0xADC1,
    0xADDC,
    0xADDD,
    0xADF8,
    0xADF9,
    0xAE14,
    0xAE15,
    0xAE30,
    0xAE31,
    0xAE4C,
    0xAE4D,
    0xAE68,
    0xAE69,
    0xAE84,
    0xAE85,
    0xAEA0,
    0xAEA1,
    0xAEBC,
    0xAEBD,
    0xAED8,
    0xAED9,
    0xAEF4,
    0xAEF5,
    0xAF10,
    0xAF11,
    0xAF2C,
    0xAF2D,
    0xAF48,
    0xAF49,
    0xAF64,
    0xAF65,
    0xAF80,
    0xAF81,
    0xAF9C,
    0xAF9D,
    0xAFB8,
    0xAFB9,
    0xAFD4,
    0xAFD5,
    0xAFF0,
    0xAFF1,
    0xB00C,
    0xB00D,
    0xB028,
    0xB029,
    0xB044,
    0xB045,
    0xB060,
    0xB061,
    0xB07C,
    0xB07D,
    0xB098,
    0xB099,
    0xB0B4,
    0xB0B5,
    0xB0D0,
    0xB0D1,
    0xB0EC,
    0xB0ED,
    0xB108,
    0xB109,
    0xB124,
    0xB125,
    0xB140,
    0xB141,
    0xB15C,
    0xB15D,
    0xB178,
    0xB179,
    0xB194,
    0xB195,
    0xB1B0,
    0xB1B1,
    0xB1CC,
    0xB1CD,
    0xB1E8,
    0xB1E9,
    0xB204,
    0xB205,
    0xB220,
    0xB221,
    0xB23C,
    0xB23D,
    0xB258,
    0xB259,
    0xB274,
    0xB275,
    0xB290,
    0xB291,
    0xB2AC,
    0xB2AD,
    0xB2C8,
    0xB2C9,
    0xB2E4,
    0xB2E5,
    0xB300,
    0xB301,
    0xB31C,
    0xB31D,
    0xB338,
    0xB339,
    0xB354,
    0xB355,
    0xB370,
    0xB371,
    0xB38C,
    0xB38D,
    0xB3A8,
    0xB3A9,
    0xB3C4,
    0xB3C5,
    0xB3E0,
    0xB3E1,
    0xB3FC,
    0xB3FD,
    0xB418,
    0xB419,
    0xB434,
    0xB435,
    0xB450,
    0xB451,
    0xB46C,
    0xB46D,
    0xB488,
    0xB489,
    0xB4A4,
    0xB4A5,
    0xB4C0,
    0xB4C1,
    0xB4DC,
    0xB4DD,
    0xB4F8,
    0xB4F9,
    0xB514,
    0xB515,
    0xB530,
    0xB531,
    0xB54C,
    0xB54D,
    0xB568,
    0xB569,
    0xB584,
    0xB585,
    0xB5A0,
    0xB5A1,
    0xB5BC,
    0xB5BD,
    0xB5D8,
    0xB5D9,
    0xB5F4,
    0xB5F5,
    0xB610,
    0xB611,
    0xB62C,
    0xB62D,
    0xB648,
    0xB649,
    0xB664,
    0xB665,
    0xB680,
    0xB681,
    0xB69C,
    0xB69D,
    0xB6B8,
    0xB6B9,
    0xB6D4,
    0xB6D5,
    0xB6F0,
    0xB6F1,
    0xB70C,
    0xB70D,
    0xB728,
    0xB729,
    0xB744,
    0xB745,
    0xB760,
    0xB761,
    0xB77C,
    0xB77D,
    0xB798,
    0xB799,
    0xB7B4,
    0xB7B5,
    0xB7D0,
    0xB7D1,
    0xB7EC,
    0xB7ED,
    0xB808,
    0xB809,
    0xB824,
    0xB825,
    0xB840,
    0xB841,
    0xB85C,
    0xB85D,
    0xB878,
    0xB879,
    0xB894,
    0xB895,
    0xB8B0,
    0xB8B1,
    0xB8CC,
    0xB8CD,
    0xB8E8,
    0xB8E9,
    0xB904,
    0xB905,
    0xB920,
    0xB921,
    0xB93C,
    0xB93D,
    0xB958,
    0xB959,
    0xB974,
    0xB975,
    0xB990,
    0xB991,
    0xB9AC,
    0xB9AD,
    0xB9C8,
    0xB9C9,
    0xB9E4,
    0xB9E5,
    0xBA00,
    0xBA01,
    0xBA1C,
    0xBA1D,
    0xBA38,
    0xBA39,
    0xBA54,
    0xBA55,
    0xBA70,
    0xBA71,
    0xBA8C,
    0xBA8D,
    0xBAA8,
    0xBAA9,
    0xBAC4,
    0xBAC5,
    0xBAE0,
    0xBAE1,
    0xBAFC,
    0xBAFD,
    0xBB18,
    0xBB19,
    0xBB34,
    0xBB35,
    0xBB50,
    0xBB51,
    0xBB6C,
    0xBB6D,
    0xBB88,
    0xBB89,
    0xBBA4,
    0xBBA5,
    0xBBC0,
    0xBBC1,
    0xBBDC,
    0xBBDD,
    0xBBF8,
    0xBBF9,
    0xBC14,
    0xBC15,
    0xBC30,
    0xBC31,
    0xBC4C,
    0xBC4D,
    0xBC68,
    0xBC69,
    0xBC84,
    0xBC85,
    0xBCA0,
    0xBCA1,
    0xBCBC,
    0xBCBD,
    0xBCD8,
    0xBCD9,
    0xBCF4,
    0xBCF5,
    0xBD10,
    0xBD11,
    0xBD2C,
    0xBD2D,
    0xBD48,
    0xBD49,
    0xBD64,
    0xBD65,
    0xBD80,
    0xBD81,
    0xBD9C,
    0xBD9D,
    0xBDB8,
    0xBDB9,
    0xBDD4,
    0xBDD5,
    0xBDF0,
    0xBDF1,
    0xBE0C,
    0xBE0D,
    0xBE28,
    0xBE29,
    0xBE44,
    0xBE45,
    0xBE60,
    0xBE61,
    0xBE7C,
    0xBE7D,
    0xBE98,
    0xBE99,
    0xBEB4,
    0xBEB5,
    0xBED0,
    0xBED1,
    0xBEEC,
    0xBEED,
    0xBF08,
    0xBF09,
    0xBF24,
    0xBF25,
    0xBF40,
    0xBF41,
    0xBF5C,
    0xBF5D,
    0xBF78,
    0xBF79,
    0xBF94,
    0xBF95,
    0xBFB0,
    0xBFB1,
    0xBFCC,
    0xBFCD,
    0xBFE8,
    0xBFE9,
    0xC004,
    0xC005,
    0xC020,
    0xC021,
    0xC03C,
    0xC03D,
    0xC058,
    0xC059,
    0xC074,
    0xC075,
    0xC090,
    0xC091,
    0xC0AC,
    0xC0AD,
    0xC0C8,
    0xC0C9,
    0xC0E4,
    0xC0E5,
    0xC100,
    0xC101,
    0xC11C,
    0xC11D,
    0xC138,
    0xC139,
    0xC154,
    0xC155,
    0xC170,
    0xC171,
    0xC18C,
    0xC18D,
    0xC1A8,
    0xC1A9,
    0xC1C4,
    0xC1C5,
    0xC1E0,
    0xC1E1,
    0xC1FC,
    0xC1FD,
    0xC218,
    0xC219,
    0xC234,
    0xC235,
    0xC250,
    0xC251,
    0xC26C,
    0xC26D,
    0xC288,
    0xC289,
    0xC2A4,
    0xC2A5,
    0xC2C0,
    0xC2C1,
    0xC2DC,
    0xC2DD,
    0xC2F8,
    0xC2F9,
    0xC314,
    0xC315,
    0xC330,
    0xC331,
    0xC34C,
    0xC34D,
    0xC368,
    0xC369,
    0xC384,
    0xC385,
    0xC3A0,
    0xC3A1,
    0xC3BC,
    0xC3BD,
    0xC3D8,
    0xC3D9,
    0xC3F4,
    0xC3F5,
    0xC410,
    0xC411,
    0xC42C,
    0xC42D,
    0xC448,
    0xC449,
    0xC464,
    0xC465,
    0xC480,
    0xC481,
    0xC49C,
    0xC49D,
    0xC4B8,
    0xC4B9,
    0xC4D4,
    0xC4D5,
    0xC4F0,
    0xC4F1,
    0xC50C,
    0xC50D,
    0xC528,
    0xC529,
    0xC544,
    0xC545,
    0xC560,
    0xC561,
    0xC57C,
    0xC57D,
    0xC598,
    0xC599,
    0xC5B4,
    0xC5B5,
    0xC5D0,
    0xC5D1,
    0xC5EC,
    0xC5ED,
    0xC608,
    0xC609,
    0xC624,
    0xC625,
    0xC640,
    0xC641,
    0xC65C,
    0xC65D,
    0xC678,
    0xC679,
    0xC694,
    0xC695,
    0xC6B0,
    0xC6B1,
    0xC6CC,
    0xC6CD,
    0xC6E8,
    0xC6E9,
    0xC704,
    0xC705,
    0xC720,
    0xC721,
    0xC73C,
    0xC73D,
    0xC758,
    0xC759,
    0xC774,
    0xC775,
    0xC790,
    0xC791,
    0xC7AC,
    0xC7AD,
    0xC7C8,
    0xC7C9,
    0xC7E4,
    0xC7E5,
    0xC800,
    0xC801,
    0xC81C,
    0xC81D,
    0xC838,
    0xC839,
    0xC854,
    0xC855,
    0xC870,
    0xC871,
    0xC88C,
    0xC88D,
    0xC8A8,
    0xC8A9,
    0xC8C4,
    0xC8C5,
    0xC8E0,
    0xC8E1,
    0xC8FC,
    0xC8FD,
    0xC918,
    0xC919,
    0xC934,
    0xC935,
    0xC950,
    0xC951,
    0xC96C,
    0xC96D,
    0xC988,
    0xC989,
    0xC9A4,
    0xC9A5,
    0xC9C0,
    0xC9C1,
    0xC9DC,
    0xC9DD,
    0xC9F8,
    0xC9F9,
    0xCA14,
    0xCA15,
    0xCA30,
    0xCA31,
    0xCA4C,
    0xCA4D,
    0xCA68,
    0xCA69,
    0xCA84,
    0xCA85,
    0xCAA0,
    0xCAA1,
    0xCABC,
    0xCABD,
    0xCAD8,
    0xCAD9,
    0xCAF4,
    0xCAF5,
    0xCB10,
    0xCB11,
    0xCB2C,
    0xCB2D,
    0xCB48,
    0xCB49,
    0xCB64,
    0xCB65,
    0xCB80,
    0xCB81,
    0xCB9C,
    0xCB9D,
    0xCBB8,
    0xCBB9,
    0xCBD4,
    0xCBD5,
    0xCBF0,
    0xCBF1,
    0xCC0C,
    0xCC0D,
    0xCC28,
    0xCC29,
    0xCC44,
    0xCC45,
    0xCC60,
    0xCC61,
    0xCC7C,
    0xCC7D,
    0xCC98,
    0xCC99,
    0xCCB4,
    0xCCB5,
    0xCCD0,
    0xCCD1,
    0xCCEC,
    0xCCED,
    0xCD08,
    0xCD09,
    0xCD24,
    0xCD25,
    0xCD40,
    0xCD41,
    0xCD5C,
    0xCD5D,
    0xCD78,
    0xCD79,
    0xCD94,
    0xCD95,
    0xCDB0,
    0xCDB1,
    0xCDCC,
    0xCDCD,
    0xCDE8,
    0xCDE9,
    0xCE04,
    0xCE05,
    0xCE20,
    0xCE21,
    0xCE3C,
    0xCE3D,
    0xCE58,
    0xCE59,
    0xCE74,
    0xCE75,
    0xCE90,
    0xCE91,
    0xCEAC,
    0xCEAD,
    0xCEC8,
    0xCEC9,
    0xCEE4,
    0xCEE5,
    0xCF00,
    0xCF01,
    0xCF1C,
    0xCF1D,
    0xCF38,
    0xCF39,
    0xCF54,
    0xCF55,
    0xCF70,
    0xCF71,
    0xCF8C,
    0xCF8D,
    0xCFA8,
    0xCFA9,
    0xCFC4,
    0xCFC5,
    0xCFE0,
    0xCFE1,
    0xCFFC,
    0xCFFD,
    0xD018,
    0xD019,
    0xD034,
    0xD035,
    0xD050,
    0xD051,
    0xD06C,
    0xD06D,
    0xD088,
    0xD089,
    0xD0A4,
    0xD0A5,
    0xD0C0,
    0xD0C1,
    0xD0DC,
    0xD0DD,
    0xD0F8,
    0xD0F9,
    0xD114,
    0xD115,
    0xD130,
    0xD131,
    0xD14C,
    0xD14D,
    0xD168,
    0xD169,
    0xD184,
    0xD185,
    0xD1A0,
    0xD1A1,
    0xD1BC,
    0xD1BD,
    0xD1D8,
    0xD1D9,
    0xD1F4,
    0xD1F5,
    0xD210,
    0xD211,
    0xD22C,
    0xD22D,
    0xD248,
    0xD249,
    0xD264,
    0xD265,
    0xD280,
    0xD281,
    0xD29C,
    0xD29D,
    0xD2B8,
    0xD2B9,
    0xD2D4,
    0xD2D5,
    0xD2F0,
    0xD2F1,
    0xD30C,
    0xD30D,
    0xD328,
    0xD329,
    0xD344,
    0xD345,
    0xD360,
    0xD361,
    0xD37C,
    0xD37D,
    0xD398,
    0xD399,
    0xD3B4,
    0xD3B5,
    0xD3D0,
    0xD3D1,
    0xD3EC,
    0xD3ED,
    0xD408,
    0xD409,
    0xD424,
    0xD425,
    0xD440,
    0xD441,
    0xD45C,
    0xD45D,
    0xD478,
    0xD479,
    0xD494,
    0xD495,
    0xD4B0,
    0xD4B1,
    0xD4CC,
    0xD4CD,
    0xD4E8,
    0xD4E9,
    0xD504,
    0xD505,
    0xD520,
    0xD521,
    0xD53C,
    0xD53D,
    0xD558,
    0xD559,
    0xD574,
    0xD575,
    0xD590,
    0xD591,
    0xD5AC,
    0xD5AD,
    0xD5C8,
    0xD5C9,
    0xD5E4,
    0xD5E5,
    0xD600,
    0xD601,
    0xD61C,
    0xD61D,
    0xD638,
    0xD639,
    0xD654,
    0xD655,
    0xD670,
    0xD671,
    0xD68C,
    0xD68D,
    0xD6A8,
    0xD6A9,
    0xD6C4,
    0xD6C5,
    0xD6E0,
    0xD6E1,
    0xD6FC,
    0xD6FD,
    0xD718,
    0xD719,
    0xD734,
    0xD735,
    0xD750,
    0xD751,
    0xD76C,
    0xD76D,
    0xD788,
    0xD789,
    0xD7A4,
    0xD7B0,
    0xD7C7,
    0xD7CB,
    0xD7FC,
    0xF900,
    0xFB00,
    0xFB1D,
    0xFB1E,
    0xFB1F,
    0xFB29,
    0xFB2A,
    0xFB37,
    0xFB38,
    0xFB3D,
    0xFB3E,
    0xFB3F,
    0xFB40,
    0xFB42,
    0xFB43,
    0xFB45,
    0xFB46,
    0xFB50,
    0xFD3E,
    0xFD3F,
    0xFD40,
    0xFDFC,
    0xFDFD,
    0xFE00,
    0xFE10,
    0xFE11,
    0xFE13,
    0xFE15,
    0xFE17,
    0xFE18,
    0xFE19,
    0xFE1A,
    0xFE20,
    0xFE30,
    0xFE35,
    0xFE36,
    0xFE37,
    0xFE38,
    0xFE39,
    0xFE3A,
    0xFE3B,
    0xFE3C,
    0xFE3D,
    0xFE3E,
    0xFE3F,
    0xFE40,
    0xFE41,
    0xFE42,
    0xFE43,
    0xFE44,
    0xFE45,
    0xFE47,
    0xFE48,
    0xFE49,
    0xFE50,
    0xFE51,
    0xFE52,
    0xFE53,
    0xFE54,
    0xFE56,
    0xFE58,
    0xFE59,
    0xFE5A,
    0xFE5B,
    0xFE5C,
    0xFE5D,
    0xFE5E,
    0xFE5F,
    0xFE67,
    0xFE68,
    0xFE69,
    0xFE6A,
    0xFE6B,
    0xFE6C,
    0xFEFF,
    0xFF00,
    0xFF01,
    0xFF02,
    0xFF04,
    0xFF05,
    0xFF06,
    0xFF08,
    0xFF09,
    0xFF0A,
    0xFF0C,
    0xFF0D,
    0xFF0E,
    0xFF0F,
    0xFF1A,
    0xFF1C,
    0xFF1F,
    0xFF20,
    0xFF3B,
    0xFF3C,
    0xFF3D,
    0xFF3E,
    0xFF5B,
    0xFF5C,
    0xFF5D,
    0xFF5E,
    0xFF5F,
    0xFF60,
    0xFF62,
    0xFF63,
    0xFF65,
    0xFF66,
    0xFF67,
    0xFF71,
    0xFF9E,
    0xFFA0,
    0xFFBF,
    0xFFC2,
    0xFFC8,
    0xFFCA,
    0xFFD0,
    0xFFD2,
    0xFFD8,
    0xFFDA,
    0xFFDD,
    0xFFE0,
    0xFFE1,
    0xFFE2,
    0xFFE5,
    0xFFE7,
    0xFFF9,
    0xFFFC,
    0xFFFD,
    0x10100,
    0x10103,
    0x101FD,
    0x101FE,
    0x102E0,
    0x102E1,
    0x10376,
    0x1037B,
    0x1039F,
    0x103A0,
    0x103D0,
    0x103D1,
    0x104A0,
    0x104AA,
    0x10857,
    0x10858,
    0x1091F,
    0x10920,
    0x10A01,
    0x10A04,
    0x10A05,
    0x10A07,
    0x10A0C,
    0x10A10,
    0x10A38,
    0x10A3B,
    0x10A3F,
    0x10A40,
    0x10A50,
    0x10A58,
    0x10AE5,
    0x10AE7,
    0x10AF0,
    0x10AF6,
    0x10AF7,
    0x10B39,
    0x10B40,
    0x10D24,
    0x10D28,
    0x10D30,
    0x10D3A,
    0x10EAB,
    0x10EAD,
    0x10EAE,
    0x10EFD,
    0x10F00,
    0x10F46,
    0x10F51,
    0x10F82,
    0x10F86,
    0x11000,
    0x11003,
    0x11038,
    0x11047,
    0x11049,
    0x11066,
    0x11070,
    0x11071,
    0x11073,
    0x11075,
    0x1107F,
    0x11083,
    0x110B0,
    0x110BB,
    0x110BE,
    0x110C2,
    0x110C3,
    0x110F0,
    0x110FA,
    0x11100,
    0x11103,
    0x11127,
    0x11135,
    0x11136,
    0x11140,
    0x11144,
    0x11145,
    0x11147,
    0x11173,
    0x11174,
    0x11175,
    0x11176,
    0x11180,
    0x11183,
    0x111B3,
    0x111C1,
    0x111C5,
    0x111C7,
    0x111C8,
    0x111C9,
    0x111CD,
    0x111CE,
    0x111D0,
    0x111DA,
    0x111DB,
    0x111DC,
    0x111DD,
    0x111E0,
    0x1122C,
    0x11238,
    0x1123A,
    0x1123B,
    0x1123D,
    0x1123E,
    0x1123F,
    0x11241,
    0x11242,
    0x112A9,
    0x112AA,
    0x112DF,
    0x112EB,
    0x112F0,
    0x112FA,
    0x11300,
    0x11304,
    0x1133B,
    0x1133D,
    0x1133E,
    0x11345,
    0x11347,
    0x11349,
    0x1134B,
    0x1134E,
    0x11357,
    0x11358,
    0x11362,
    0x11364,
    0x11366,
    0x1136D,
    0x11370,
    0x11375,
    0x11435,
    0x11447,
    0x1144B,
    0x1144F,
    0x11450,
    0x1145A,
    0x1145C,
    0x1145E,
    0x1145F,
    0x114B0,
    0x114C4,
    0x114D0,
    0x114DA,
    0x115AF,
    0x115B6,
    0x115B8,
    0x115C1,
    0x115C2,
    0x115C4,
    0x115C6,
    0x115C9,
    0x115D8,
    0x115DC,
    0x115DE,
    0x11630,
    0x11641,
    0x11643,
    0x11650,
    0x1165A,
    0x11660,
    0x1166D,
    0x116AB,
    0x116B8,
    0x116C0,
    0x116CA,
    0x1171D,
    0x1172C,
    0x11730,
    0x1173A,
    0x1173C,
    0x1173F,
    0x1182C,
    0x1183B,
    0x118E0,
    0x118EA,
    0x11930,
    0x11936,
    0x11937,
    0x11939,
    0x1193B,
    0x1193F,
    0x11940,
    0x11941,
    0x11942,
    0x11944,
    0x11947,
    0x11950,
    0x1195A,
    0x119D1,
    0x119D8,
    0x119DA,
    0x119E1,
    0x119E2,
    0x119E3,
    0x119E4,
    0x119E5,
    0x11A01,
    0x11A0B,
    0x11A33,
    0x11A3A,
    0x11A3B,
    0x11A3F,
    0x11A40,
    0x11A41,
    0x11A45,
    0x11A46,
    0x11A47,
    0x11A48,
    0x11A51,
    0x11A5C,
    0x11A8A,
    0x11A9A,
    0x11A9D,
    0x11A9E,
    0x11AA1,
    0x11AA3,
    0x11B00,
    0x11B0A,
    0x11C2F,
    0x11C37,
    0x11C38,
    0x11C40,
    0x11C41,
    0x11C46,
    0x11C50,
    0x11C5A,
    0x11C70,
    0x11C71,
    0x11C72,
    0x11C92,
    0x11CA8,
    0x11CA9,
    0x11CB7,
    0x11D31,
    0x11D37,
    0x11D3A,
    0x11D3B,
    0x11D3C,
    0x11D3E,
    0x11D3F,
    0x11D46,
    0x11D47,
    0x11D48,
    0x11D50,
    0x11D5A,
    0x11D8A,
    0x11D8F,
    0x11D90,
    0x11D92,
    0x11D93,
    0x11D98,
    0x11DA0,
    0x11DAA,
    0x11EF3,
    0x11EF7,
    0x11F00,
    0x11F02,
    0x11F03,
    0x11F04,
    0x11F34,
    0x11F3B,
    0x11F3E,
    0x11F43,
    0x11F45,
    0x11F50,
    0x11F5A,
    0x11FDD,
    0x11FE1,
    0x11FFF,
    0x12000,
    0x12470,
    0x12475,
    0x13258,
    0x1325B,
    0x1325E,
    0x13282,
    0x13283,
    0x13286,
    0x13287,
    0x13288,
    0x13289,
    0x1328A,
    0x13379,
    0x1337A,
    0x1337C,
    0x13430,
    0x13437,
    0x13438,
    0x13439,
    0x1343C,
    0x1343D,
    0x1343E,
    0x1343F,
    0x13440,
    0x13441,
    0x13447,
    0x13456,
    0x145CE,
    0x145CF,
    0x145D0,
    0x16A60,
    0x16A6A,
    0x16A6E,
    0x16A70,
    0x16AC0,
    0x16ACA,
    0x16AF0,
    0x16AF5,
    0x16AF6,
    0x16B30,
    0x16B37,
    0x16B3A,
    0x16B44,
    0x16B45,
    0x16B50,
    0x16B5A,
    0x16E97,
    0x16E99,
    0x16F4F,
    0x16F50,
    0x16F51,
    0x16F88,
    0x16F8F,
    0x16F93,
    0x16FE0,
    0x16FE4,
    0x16FE5,
    0x16FF0,
    0x16FF2,
    0x17000,
    0x187F8,
    0x18800,
    0x18B00,
    0x18D00,
    0x18D09,
    0x1B000,
    0x1B123,
    0x1B132,
    0x1B133,
    0x1B150,
    0x1B153,
    0x1B155,
    0x1B156,
    0x1B164,
    0x1B168,
    0x1B170,
    0x1B2FC,
    0x1BC9D,
    0x1BC9F,
    0x1BCA0,
    0x1BCA4,
    0x1CF00,
    0x1CF2E,
    0x1CF30,
    0x1CF47,
    0x1D165,
    0x1D16A,
    0x1D16D,
    0x1D183,
    0x1D185,
    0x1D18C,
    0x1D1AA,
    0x1D1AE,
    0x1D242,
    0x1D245,
    0x1D7CE,
    0x1D800,
    0x1DA00,
    0x1DA37,
    0x1DA3B,
    0x1DA6D,
    0x1DA75,
    0x1DA76,
    0x1DA84,
    0x1DA85,
    0x1DA87,
    0x1DA8B,
    0x1DA9B,
    0x1DAA0,
    0x1DAA1,
    0x1DAB0,
    0x1E000,
    0x1E007,
    0x1E008,
    0x1E019,
    0x1E01B,
    0x1E022,
    0x1E023,
    0x1E025,
    0x1E026,
    0x1E02B,
    0x1E08F,
    0x1E090,
    0x1E130,
    0x1E137,
    0x1E140,
    0x1E14A,
    0x1E2AE,
    0x1E2AF,
    0x1E2EC,
    0x1E2F0,
    0x1E2FA,
    0x1E2FF,
    0x1E300,
    0x1E4EC,
    0x1E4F0,
    0x1E4FA,
    0x1E8D0,
    0x1E8D7,
    0x1E944,
    0x1E94B,
    0x1E950,
    0x1E95A,
    0x1E95E,
    0x1E960,
    0x1ECAC,
    0x1ECAD,
    0x1ECB0,
    0x1ECB1,
    0x1F000,
    0x1F100,
    0x1F10D,
    0x1F110,
    0x1F16D,
    0x1F170,
    0x1F1AD,
    0x1F1E6,
    0x1F200,
    0x1F385,
    0x1F386,
    0x1F39C,
    0x1F39E,
    0x1F3B5,
    0x1F3B7,
    0x1F3BC,
    0x1F3BD,
    0x1F3C2,
    0x1F3C5,
    0x1F3C7,
    0x1F3C8,
    0x1F3CA,
    0x1F3CD,
    0x1F3FB,
    0x1F400,
    0x1F442,
    0x1F444,
    0x1F446,
    0x1F451,
    0x1F466,
    0x1F479,
    0x1F47C,
    0x1F47D,
    0x1F481,
    0x1F484,
    0x1F485,
    0x1F488,
    0x1F48F,
    0x1F490,
    0x1F491,
    0x1F492,
    0x1F4A0,
    0x1F4A1,
    0x1F4A2,
    0x1F4A3,
    0x1F4A4,
    0x1F4A5,
    0x1F4AA,
    0x1F4AB,
    0x1F4AF,
    0x1F4B0,
    0x1F4B1,
    0x1F4B3,
    0x1F500,
    0x1F507,
    0x1F517,
    0x1F525,
    0x1F532,
    0x1F54A,
    0x1F574,
    0x1F576,
    0x1F57A,
    0x1F57B,
    0x1F590,
    0x1F591,
    0x1F595,
    0x1F597,
    0x1F5D4,
    0x1F5DC,
    0x1F5F4,
    0x1F5FA,
    0x1F645,
    0x1F648,
    0x1F64B,
    0x1F650,
    0x1F676,
    0x1F679,
    0x1F67C,
    0x1F680,
    0x1F6A3,
    0x1F6A4,
    0x1F6B4,
    0x1F6B7,
    0x1F6C0,
    0x1F6C1,
    0x1F6CC,
    0x1F6CD,
    0x1F700,
    0x1F774,
    0x1F780,
    0x1F7D5,
    0x1F800,
    0x1F80C,
    0x1F810,
    0x1F848,
    0x1F850,
    0x1F85A,
    0x1F860,
    0x1F888,
    0x1F890,
    0x1F8AE,
    0x1F900,
    0x1F90C,
    0x1F90D,
    0x1F90F,
    0x1F910,
    0x1F918,
    0x1F920,
    0x1F926,
    0x1F927,
    0x1F930,
    0x1F93A,
    0x1F93C,
    0x1F93F,
    0x1F977,
    0x1F978,
    0x1F9B5,
    0x1F9B7,
    0x1F9B8,
    0x1F9BA,
    0x1F9BB,
    0x1F9BC,
    0x1F9CD,
    0x1F9D0,
    0x1F9D1,
    0x1F9DE,
    0x1FA00,
    0x1FA54,
    0x1FAC3,
    0x1FAC6,
    0x1FAF0,
    0x1FAF9,
    0x1FB00,
    0x1FBF0,
    0x1FBFA,
    0x1FC00,
    0x1FFFE,
    0x20000,
    0x2FFFE,
    0x30000,
    0x3FFFE,
    0xE0001,
    0xE0002,
    0xE0020,
    0xE0080,
    0xE0100,
    0xE01F0,
)

LB_IDS = (
    7,  # CM
    2,  # BA
    24,  # LF
    4,  # BK
    9,  # CR
    7,  # CM
    33,  # SP
    12,  # EX
    31,  # QU
    0,  # AL
    30,  # PR
    29,  # PO
    0,  # AL
    31,  # QU
    28,  # OP
    8,  # CP
    0,  # AL
    30,  # PR
    20,  # IS
    17,  # HY
    20,  # IS
    34,  # SY
    27,  # NU
    20,  # IS
    0,  # AL
    12,  # EX
    0,  # AL
    28,  # OP
    30,  # PR
    8,  # CP
    0,  # AL
    28,  # OP
    2,  # BA
    6,  # CL
    0,  # AL
    7,  # CM
    25,  # NL
    7,  # CM
    13,  # GL
    28,  # OP
    29,  # PO
    30,  # PR
    0,  # AL
    31,  # QU
    0,  # AL
    2,  # BA
    0,  # AL
    29,  # PO
    30,  # PR
    0,  # AL
    3,  # BB
    0,  # AL
    31,  # QU
    0,  # AL
    28,  # OP
    0,  # AL
    3,  # BB
    0,  # AL
    3,  # BB
    0,  # AL
    3,  # BB
    0,  # AL
    7,  # CM
    13,  # GL
    7,  # CM
    13,  # GL
    7,  # CM
    0,  # AL
    20,  # IS
    0,  # AL
    7,  # CM
    0,  # AL
    20,  # IS
    2,  # BA
    0,  # AL
    30,  # PR
    0,  # AL
    7,  # CM
    2,  # BA
    7,  # CM
    0,  # AL
    7,  # CM
    0,  # AL
    7,  # CM
    12,  # EX
    7,  # CM
    0,  # AL
    16,  # HL
    0,  # AL
    16,  # HL
    0,  # AL
    29,  # PO
    20,  # IS
    0,  # AL
    7,  # CM
    12,  # EX
    7,  # CM
    12,  # EX
    0,  # AL
    7,  # CM
    27,  # NU
    29,  # PO
    27,  # NU
    0,  # AL
    7,  # CM
    0,  # AL
    12,  # EX
    0,  # AL
    7,  # CM
    0,  # AL
    7,  # CM
    0,  # AL
    7,  # CM
    0,  # AL
    7,  # CM
    0,  # AL
    27,  # NU
    0,  # AL
    7,  # CM
    0,  # AL
    7,  # CM
    0,  # AL
    7,  # CM
    0,  # AL
    27,  # NU
    0,  # AL
    7,  # CM
    0,  # AL
    20,  # IS
    12,  # EX
    0,  # AL
    7,  # CM
    30,  # PR
    0,  # AL
    7,  # CM
    0,  # AL
    7,  # CM
    0,  # AL
    7,  # CM
    0,  # AL
    7,  # CM
    0,  # AL
    7,  # CM
    0,  # AL
    7,  # CM
    0,  # AL
    7,  # CM
    0,  # AL
    7,  # CM
    0,  # AL
    7,  # CM
    0,  # AL
    7,  # CM
    0,  # AL
    7,  # CM
    0,  # AL
    7,  # CM
    2,  # BA
    27,  # NU
    0,  # AL
    7,  # CM
    0,  # AL
    7,  # CM
    0,  # AL
    7,  # CM
    0,  # AL
    7,  # CM
    0,  # AL
    7,  # CM
    0,  # AL
    7,  # CM
    0,  # AL
    7,  # CM
    0,  # AL
    27,  # NU
    0,  # AL
    29,  # PO
    0,  # AL
    29,  # PO
    0,  # AL
    30,  # PR
    0,  # AL
    7,  # CM
    0,  # AL
    7,  # CM
    0,  # AL
    7,  # CM
    0,  # AL
    7,  # CM
    0,  # AL
    7,  # CM
    0,  # AL
    7,  # CM
    0,  # AL
    7,  # CM
    0,  # AL
    27,  # NU
    7,  # CM
    0,  # AL
    7,  # CM
    0,  # AL
    7,  # CM
    0,  # AL
    7,  # CM
    0,  # AL
    7,  # CM
    0,  # AL
    7,  # CM
    0,  # AL
    7,  # CM
    0,  # AL
    7,  # CM
    0,  # AL
    27,  # NU
    0,  # AL
    30,  # PR
    0,  # AL
    7,  # CM
    0,  # AL
    7,  # CM
    0,  # AL
    7,  # CM
    0,  # AL
    7,  # CM
    0,  # AL
    7,  # CM
    0,  # AL
    7,  # CM
    0,  # AL
    7,  # CM
    0,  # AL
    7,  # CM
    0,  # AL
    27,  # NU
    0,  # AL
    7,  # CM
    0,  # AL
    7,  # CM
    0,  # AL
    7,  # CM
    0,  # AL
    7,  # CM
    0,  # AL
    7,  # CM
    0,  # AL
    27,  # NU
    0,  # AL
    30,  # PR
    0,  # AL
    7,  # CM
    0,  # AL
    7,  # CM
    0,  # AL
    7,  # CM
    0,  # AL
    7,  # CM
    0,  # AL
    7,  # CM
    0,  # AL
    7,  # CM
    0,  # AL
    7,  # CM
    0,  # AL
    27,  # NU
    0,  # AL
    3,  # BB
    0,  # AL
    7,  # CM
    3,  # BB
    0,  # AL
    7,  # CM
    0,  # AL
    7,  # CM
    0,  # AL
    7,  # CM
    0,  # AL
    7,  # CM
    0,  # AL
    7,  # CM
    0,  # AL
    7,  # CM
    0,  # AL
    27,  # NU
    0,  # AL
    7,  # CM
    0,  # AL
    7,  # CM
    0,  # AL
    7,  # CM
    0,  # AL
    7,  # CM
    0,  # AL
    7,  # CM
    0,  # AL
    7,  # CM
    0,  # AL
    7,  # CM
    0,  # AL
    7,  # CM
    0,  # AL
    27,  # NU
    0,  # AL
    29,  # PO
    0,  # AL
    7,  # CM
    0,  # AL
    7,  # CM
    0,  # AL
    7,  # CM
    0,  # AL
    7,  # CM
    0,  # AL
    7,  # CM
    0,  # AL
    27,  # NU
    0,  # AL
    7,  # CM
    0,  # AL
    7,  # CM
    0,  # AL
    7,  # CM
    0,  # AL
    30,  # PR
    0,  # AL
    7,  # CM
    0,  # AL
    27,  # NU
    2,  # BA
    0,  # AL
    7,  # CM
    0,  # AL
    7,  # CM
    0,  # AL
    7,  # CM
    0,  # AL
    27,  # NU
    0,  # AL
    3,  # BB
    0,  # AL
    3,  # BB
    13,  # GL
    3,  # BB
    2,  # BA
    13,  # GL
    12,  # EX
    13,  # GL
    0,  # AL
    12,  # EX
    0,  # AL
    7,  # CM
    0,  # AL
    27,  # NU
    0,  # AL
    2,  # BA
    7,  # CM
    0,  # AL
    7,  # CM
    0,  # AL
    7,  # CM
    28,  # OP
    6,  # CL
    28,  # OP
    6,  # CL
    7,  # CM
    0,  # AL
    7,  # CM
    2,  # BA
    7,  # CM
    2,  # BA
    7,  # CM
    0,  # AL
    7,  # CM
    0,  # AL
    7,  # CM
    0,  # AL
    2,  # BA
    0,  # AL
    7,  # CM
    0,  # AL
    3,  # BB
    2,  # BA
    3,  # BB
    0,  # AL
    13,  # GL
    0,  # AL
    7,  # CM
    0,  # AL
    27,  # NU
    2,  # BA
    0,  # AL
    7,  # CM
    0,  # AL
    7,  # CM
    0,  # AL
    7,  # CM
    0,  # AL
    7,  # CM
    0,  # AL
    7,  # CM
    0,  # AL
    7,  # CM
    0,  # AL
    7,  # CM
    27,  # NU
    7,  # CM
    0,  # AL
    21,  # JL
    23,  # JV
    22,  # JT
    0,  # AL
    7,  # CM
    0,  # AL
    2,  # BA
    0,  # AL
    2,  # BA
    0,  # AL
    2,  # BA
    0,  # AL
    28,  # OP
    6,  # CL
    0,  # AL
    2,  # BA
    0,  # AL
    7,  # CM
    0,  # AL
    7,  # CM
    2,  # BA
    0,  # AL
    7,  # CM
    0,  # AL
    7,  # CM
    0,  # AL
    7,  # CM
    2,  # BA
    26,  # NS
    0,  # AL
    2,  # BA
    0,  # AL
    2,  # BA
    30,  # PR
    0,  # AL
    7,  # CM
    0,  # AL
    27,  # NU
    0,  # AL
    12,  # EX
    2,  # BA
    3,  # BB
    0,  # AL
    12,  # EX
    0,  # AL
    7,  # CM
    13,  # GL
    7,  # CM
    27,  # NU
    0,  # AL
    7,  # CM
    0,  # AL
    7,  # CM
    0,  # AL
    7,  # CM
    0,  # AL
    7,  # CM
    0,  # AL
    12,  # EX
    27,  # NU
    0,  # AL
    27,  # NU
    0,  # AL
    7,  # CM
    0,  # AL
    7,  # CM
    0,  # AL
    7,  # CM
    0,  # AL
    7,  # CM
    27,  # NU
    0,  # AL
    27,  # NU
    0,  # AL
    7,  # CM
    0,  # AL
    7,  # CM
    0,  # AL
    7,  # CM
    0,  # AL
    27,  # NU
    2,  # BA
    0,  # AL
    2,  # BA
    0,  # AL
    7,  # CM
    0,  # AL
    2,  # BA
    0,  # AL
    7,  # CM
    0,  # AL
    7,  # CM
    0,  # AL
    27,  # NU
    0,  # AL
    7,  # CM
    0,  # AL
    7,  # CM
    0,  # AL
    2,  # BA
    27,  # NU
    0,  # AL
    27,  # NU
    0,  # AL
    2,  # BA
    0,  # AL
    7,  # CM
    0,  # AL
    7,  # CM
    0,  # AL
    7,  # CM
    0,  # AL
    7,  # CM
    0,  # AL
    7,  # CM
    0,  # AL
    7,  # CM
    13,  # GL
    7,  # CM
    13,  # GL
    7,  # CM
    0,  # AL
    3,  # BB
    0,  # AL
    2,  # BA
    13,  # GL
    2,  # BA
    36,  # ZW
    7,  # CM
    37,  # ZWJ
    7,  # CM
    2,  # BA
    13,  # GL
    2,  # BA
    1,  # B2
    0,  # AL
    31,  # QU
    28,  # OP
    31,  # QU
    28,  # OP
    31,  # QU
    0,  # AL
    19,  # IN
    2,  # BA
    4,  # BK
    7,  # CM
    13,  # GL
    29,  # PO
    0,  # AL
    31,  # QU
    0,  # AL
    26,  # NS
    0,  # AL
    20,  # IS
    28,  # OP
    6,  # CL
    26,  # NS
    0,  # AL
    2,  # BA
    29,  # PO
    2,  # BA
    0,  # AL
    2,  # BA
    35,  # WJ
    0,  # AL
    7,  # CM
    0,  # AL
    28,  # OP
    6,  # CL
    0,  # AL
    28,  # OP
    6,  # CL
    0,  # AL
    30,  # PR
    29,  # PO
    30,  # PR
    29,  # PO
    30,  # PR
    29,  # PO
    30,  # PR
    29,  # PO
    30,  # PR
    29,  # PO
    30,  # PR
    7,  # CM
    0,  # AL
    29,  # PO
    0,  # AL
    29,  # PO
    0,  # AL
    30,  # PR
    0,  # AL
    30,  # PR
    0,  # AL
    19,  # IN
    0,  # AL
    28,  # OP
    6,  # CL
    28,  # OP
    6,  # CL
    0,  # AL
    18,  # ID
    0,  # AL
    28,  # OP
    6,  # CL
    0,  # AL
    18,  # ID
    0,  # AL
    18,  # ID
    0,  # AL
    18,  # ID
    0,  # AL
    18,  # ID
    0,  # AL
    18,  # ID
    10,  # EB
    18,  # ID
    0,  # AL
    18,  # ID
    0,  # AL
    18,  # ID
    0,  # AL
    18,  # ID
    0,  # AL
    18,  # ID
    0,  # AL
    18,  # ID
    0,  # AL
    18,  # ID
    0,  # AL
    18,  # ID
    0,  # AL
    18,  # ID
    0,  # AL
    18,  # ID
    0,  # AL
    18,  # ID
    0,  # AL
    18,  # ID
    0,  # AL
    18,  # ID
    0,  # AL
    18,  # ID
    10,  # EB
    18,  # ID
    0,  # AL
    18,  # ID
    0,  # AL
    18,  # ID
    10,  # EB
    0,  # AL
    31,  # QU
    0,  # AL
    12,  # EX
    18,  # ID
    0,  # AL
    28,  # OP
    6,  # CL
    28,  # OP
    6,  # CL
    28,  # OP
    6,  # CL
    28,  # OP
    6,  # CL
    28,  # OP
    6,  # CL
    28,  # OP
    6,  # CL
    28,  # OP
    6,  # CL
    0,  # AL
    28,  # OP
    6,  # CL
    0,  # AL
    28,  # OP
    6,  # CL
    28,  # OP
    6,  # CL
    28,  # OP
    6,  # CL
    28,  # OP
    6,  # CL
    28,  # OP
    6,  # CL
    0,  # AL
    28,  # OP
    6,  # CL
    28,  # OP
    6,  # CL
    28,  # OP
    6,  # CL
    28,  # OP
    6,  # CL
    28,  # OP
    6,  # CL
    28,  # OP
    6,  # CL
    28,  # OP
    6,  # CL
    28,  # OP
    6,  # CL
    28,  # OP
    6,  # CL
    28,  # OP
    6,  # CL
    28,  # OP
    6,  # CL
    0,  # AL
    28,  # OP
    6,  # CL
    28,  # OP
    6,  # CL
    0,  # AL
    28,  # OP
    6,  # CL
    0,  # AL
    7,  # CM
    0,  # AL
    12,  # EX
    2,  # BA
    0,  # AL
    12,  # EX
    2,  # BA
    0,  # AL
    2,  # BA
    0,  # AL
    7,  # CM
    0,  # AL
    7,  # CM
    31,  # QU
    2,  # BA
    0,  # AL
    2,  # BA
    28,  # OP
    2,  # BA
    0,  # AL
    31,  # QU
    0,  # AL
    31,  # QU
    28,  # OP
    6,  # CL
    28,  # OP
    6,  # CL
    28,  # OP
    6,  # CL
    28,  # OP
    6,  # CL
    2,  # BA
    12,  # EX
    0,  # AL
    2,  # BA
    0,  # AL
    2,  # BA
    0,  # AL
    1,  # B2
    2,  # BA
    0,  # AL
    2,  # BA
    28,  # OP
    2,  # BA
    0,  # AL
    2,  # BA
    0,  # AL
    2,  # BA
    0,  # AL
    12,  # EX
    28,  # OP
    6,  # CL
    28,  # OP
    6,  # CL
    28,  # OP
    6,  # CL
    28,  # OP
    6,  # CL
    2,  # BA
    0,  # AL
    18,  # ID
    0,  # AL
    18,  # ID
    0,  # AL
    18,  # ID
    0,  # AL
    18,  # ID
    0,  # AL
    2,  # BA
    6,  # CL
    18,  # ID
    26,  # NS
    18,  # ID
    28,  # OP
    6,  # CL
    28,  # OP
    6,  # CL
    28,  # OP
    6,  # CL
    28,  # OP
    6,  # CL
    28,  # OP
    6,  # CL
    18,  # ID
    28,  # OP
    6,  # CL
    28,  # OP
    6,  # CL
    28,  # OP
    6,  # CL
    28,  # OP
    6,  # CL
    26,  # NS
    28,  # OP
    6,  # CL
    18,  # ID
    7,  # CM
    18,  # ID
    7,  # CM
    18,  # ID
    26,  # NS
    18,  # ID
    0,  # AL
    26,  # NS
    18,  # ID
    26,  # NS
    18,  # ID
    26,  # NS
    18,  # ID
    26,  # NS
    18,  # ID
    26,  # NS
    18,  # ID
    26,  # NS
    18,  # ID
    26,  # NS
    18,  # ID
    26,  # NS
    18,  # ID
    26,  # NS
    18,  # ID
    26,  # NS
    18,  # ID
    26,  # NS
    0,  # AL
    7,  # CM
    26,  # NS
    18,  # ID
    26,  # NS
    18,  # ID
    26,  # NS
    18,  # ID
    26,  # NS
    18,  # ID
    26,  # NS
    18,  # ID
    26,  # NS
    18,  # ID
    26,  # NS
    18,  # ID
    26,  # NS
    18,  # ID
    26,  # NS
    18,  # ID
    26,  # NS
    18,  # ID
    26,  # NS
    18,  # ID
    26,  # NS
    18,  # ID
    26,  # NS
    18,  # ID
    0,  # AL
    18,  # ID
    0,  # AL
    18,  # ID
    0,  # AL
    18,  # ID
    0,  # AL
    26,  # NS
    18,  # ID
    0,  # AL
    18,  # ID
    0,  # AL
    18,  # ID
    0,  # AL
    18,  # ID
    26,  # NS
    18,  # ID
    0,  # AL
    18,  # ID
    0,  # AL
    2,  # BA
    0,  # AL
    2,  # BA
    12,  # EX
    2,  # BA
    0,  # AL
    27,  # NU
    0,  # AL
    7,  # CM
    0,  # AL
    7,  # CM
    0,  # AL
    7,  # CM
    0,  # AL
    7,  # CM
    0,  # AL
    2,  # BA
    0,  # AL
    7,  # CM
    0,  # AL
    7,  # CM
    0,  # AL
    7,  # CM
    0,  # AL
    7,  # CM
    0,  # AL
    7,  # CM
    0,  # AL
    29,  # PO
    0,  # AL
    3,  # BB
    12,  # EX
    0,  # AL
    7,  # CM
    0,  # AL
    7,  # CM
    0,  # AL
    2,  # BA
    27,  # NU
    0,  # AL
    7,  # CM
    0,  # AL
    3,  # BB
    0,  # AL
    7,  # CM
    27,  # NU
    0,  # AL
    7,  # CM
    2,  # BA
    0,  # AL
    7,  # CM
    0,  # AL
    21,  # JL
    0,  # AL
    7,  # CM
    0,  # AL
    7,  # CM
    0,  # AL
    2,  # BA
    0,  # AL
    27,  # NU
    0,  # AL
    7,  # CM
    0,  # AL
    27,  # NU
    0,  # AL
    7,  # CM
    0,  # AL
    7,  # CM
    0,  # AL
    7,  # CM
    0,  # AL
    27,  # NU
    0,  # AL
    2,  # BA
    0,  # AL
    7,  # CM
    0,  # AL
    7,  # CM
    0,  # AL
    7,  # CM
    0,  # AL
    7,  # CM
    0,  # AL
    7,  # CM
    0,  # AL
    7,  # CM
    0,  # AL
    7,  # CM
    2,  # BA
    0,  # AL
    7,  # CM
    0,  # AL
    7,  # CM
    2,  # BA
    7,  # CM
    0,  # AL
    27,  # NU
    0,  # AL
    14,  # H2
    15,  # H3
    14,  # H2
    15,  # H3
    14,  # H2
    15,  # H3
    14,  # H2
    15,  # H3
    14,  # H2
    15,  # H3
    14,  # H2
    15,  # H3
    14,  # H2
    15,  # H3
    14,  # H2
    15,  # H3
    14,  # H2
    15,  # H3
    14,  # H2
    15,  # H3
    14,  # H2
    15,  # H3
    14,  # H2
    15,  # H3
    14,  # H2
    15,  # H3
    14,  # H2
    15,  # H3
    14,  # H2
    15,  # H3
    14,  # H2
    15,  # H3
    14,  # H2
    15,  # H3
    14,  # H2
    15,  # H3
    14,  # H2
    15,  # H3
    14,  # H2
    15,  # H3
    14,  # H2
    15,  # H3
    14,  # H2
    15,  # H3
    14,  # H2
    15,  # H3
    14,  # H2
    15,  # H3
    14,  # H2
    15,  # H3
    14,  # H2
    15,  # H3
    14,  # H2
    15,  # H3
    14,  # H2
    15,  # H3
    14,  # H2
    15,  # H3
    14,  # H2
    15,  # H3
    14,  # H2
    15,  # H3
    14,  # H2
    15,  # H3
    14,  # H2
    15,  # H3
    14,  # H2
    15,  # H3
    14,  # H2
    15,  # H3
    14,  # H2
    15,  # H3
    14,  # H2
    15,  # H3
    14,  # H2
    15,  # H3
    14,  # H2
    15,  # H3
    14,  # H2
    15,  # H3
    14,  # H2
    15,  # H3
    14,  # H2
    15,  # H3
    14,  # H2
    15,  # H3
    14,  # H2
    15,  # H3
    14,  # H2
    15,  # H3
    14,  # H2
    15,  # H3
    14,  # H2
    15,  # H3
    14,  # H2
    15,  # H3
    14,  # H2
    15,  # H3
    14,  # H2
    15,  # H3
    14,  # H2
    15,  # H3
    14,  # H2
    15,  # H3
    14,  # H2
    15,  # H3
    14,  # H2
    15,  # H3
    14,  # H2
    15,  # H3
    14,  # H2
    15,  # H3
    14,  # H2
    15,  # H3
    14,  # H2
    15,  # H3
    14,  # H2
    15,  # H3
    14,  # H2
    15,  # H3
    14,  # H2
    15,  # H3
    14,  # H2
    15,  # H3
    14,  # H2
    15,  # H3
    14,  # H2
    15,  # H3
    14,  # H2
    15,  # H3
    14,  # H2
    15,  # H3
    14,  # H2
    15,  # H3
    14,  # H2
    15,  # H3
    14,  # H2
    15,  # H3
    14,  # H2
    15,  # H3
    14,  # H2
    15,  # H3
    14,  # H2
    15,  # H3
    14,  # H2
    15,  # H3
    14,  # H2
    15,  # H3
    14,  # H2
    15,  # H3
    14,  # H2
    15,  # H3
    14,  # H2
    15,  # H3
    14,  # H2
    15,  # H3
    14,  # H2
    15,  # H3
    14,  # H2
    15,  # H3
    14,  # H2
    15,  # H3
    14,  # H2
    15,  # H3
    14,  # H2
    15,  # H3
    14,  # H2
    15,  # H3
    14,  # H2
    15,  # H3
    14,  # H2
    15,  # H3
    14,  # H2
    15,  # H3
    14,  # H2
    15,  # H3
    14,  # H2
    15,  # H3
    14,  # H2
    15,  # H3
    14,  # H2
    15,  # H3
    14,  # H2
    15,  # H3
    14,  # H2
    15,  # H3
    14,  # H2
    15,  # H3
    14,  # H2
    15,  # H3
    14,  # H2
    15,  # H3
    14,  # H2
    15,  # H3
    14,  # H2
    15,  # H3
    14,  # H2
    15,  # H3
    14,  # H2
    15,  # H3
    14,  # H2
    15,  # H3
    14,  # H2
    15,  # H3
    14,  # H2
    15,  # H3
    14,  # H2
    15,  # H3
    14,  # H2
    15,  # H3
    14,  # H2
    15,  # H3
    14,  # H2
    15,  # H3
    14,  # H2
    15,  # H3
    14,  # H2
    15,  # H3
    14,  # H2
    15,  # H3
    14,  # H2
    15,  # H3
    14,  # H2
    15,  # H3
    14,  # H2
    15,  # H3
    14,  # H2
    15,  # H3
    14,  # H2
    15,  # H3
    14,  # H2
    15,  # H3
    14,  # H2
    15,  # H3
    14,  # H2
    15,  # H3
    14,  # H2
    15,  # H3
    14,  # H2
    15,  # H3
    14,  # H2
    15,  # H3
    14,  # H2
    15,  # H3
    14,  # H2
    15,  # H3
    14,  # H2
    15,  # H3
    14,  # H2
    15,  # H3
    14,  # H2
    15,  # H3
    14,  # H2
    15,  # H3
    14,  # H2
    15,  # H3
    14,  # H2
    15,  # H3
    14,  # H2
    15,  # H3
    14,  # H2
    15,  # H3
    14,  # H2
    15,  # H3
    14,  # H2
    15,  # H3
    14,  # H2
    15,  # H3
    14,  # H2
    15,  # H3
    14,  # H2
    15,  # H3
    14,  # H2
    15,  # H3
    14,  # H2
    15,  # H3
    14,  # H2
    15,  # H3
    14,  # H2
    15,  # H3
    14,  # H2
    15,  # H3
    14,  # H2
    15,  # H3
    14,  # H2
    15,  # H3
    14,  # H2
    15,  # H3
    14,  # H2
    15,  # H3
    14,  # H2
    15,  # H3
    14,  # H2
    15,  # H3
    14,  # H2
    15,  # H3
    14,  # H2
    15,  # H3
    14,  # H2
    15,  # H3
    14,  # H2
    15,  # H3
    14,  # H2
    15,  # H3
    14,  # H2
    15,  # H3
    14,  # H2
    15,  # H3
    14,  # H2
    15,  # H3
    14,  # H2
    15,  # H3
    14,  # H2
    15,  # H3
    14,  # H2
    15,  # H3
    14,  # H2
    15,  # H3
    14,  # H2
    15,  # H3
    14,  # H2
    15,  # H3
    14,  # H2
    15,  # H3
    14,  # H2
    15,  # H3
    14,  # H2
    15,  # H3
    14,  # H2
    15,  # H3
    14,  # H2
    15,  # H3
    14,  # H2
    15,  # H3
    14,  # H2
    15,  # H3
    14,  # H2
    15,  # H3
    14,  # H2
    15,  # H3
    14,  # H2
    15,  # H3
    14,  # H2
    15,  # H3
    14,  # H2
    15,  # H3
    14,  # H2
    15,  # H3
    14,  # H2
    15,  # H3
    14,  # H2
    15,  # H3
    14,  # H2
    15,  # H3
    14,  # H2
    15,  # H3
    14,  # H2
    15,  # H3
    14,  # H2
    15,  # H3
    14,  # H2
    15,  # H3
    14,  # H2
    15,  # H3
    14,  # H2
    15,  # H3
    14,  # H2
    15,  # H3
    14,  # H2
    15,  # H3
    14,  # H2
    15,  # H3
    14,  # H2
    15,  # H3
    14,  # H2
    15,  # H3
    14,  # H2
    15,  # H3
    14,  # H2
    15,  # H3
    14,  # H2
    15,  # H3
    14,  # H2
    15,  # H3
    14,  # H2
    15,  # H3
    14,  # H2
    15,  # H3
    14,  # H2
    15,  # H3
    14,  # H2
    15,  # H3
    14,  # H2
    15,  # H3
    14,  # H2
    15,  # H3
    14,  # H2
    15,  # H3
    14,  # H2
    15,  # H3
    14,  # H2
    15,  # H3
    14,  # H2
    15,  # H3
    14,  # H2
    15,  # H3
    14,  # H2
    15,  # H3
    14,  # H2
    15,  # H3
    14,  # H2
    15,  # H3
    14,  # H2
    15,  # H3
    14,  # H2
    15,  # H3
    14,  # H2
    15,  # H3
    14,  # H2
    15,  # H3
    14,  # H2
    15,  # H3
    14,  # H2
    15,  # H3
    14,  # H2
    15,  # H3
    14,  # H2
    15,  # H3
    14,  # H2
    15,  # H3
    14,  # H2
    15,  # H3
    14,  # H2
    15,  # H3
    14,  # H2
    15,  # H3
    14,  # H2
    15,  # H3
    14,  # H2
    15,  # H3
    14,  # H2
    15,  # H3
    14,  # H2
    15,  # H3
    14,  # H2
    15,  # H3
    14,  # H2
    15,  # H3
    14,  # H2
    15,  # H3
    14,  # H2
    15,  # H3
    14,  # H2
    15,  # H3
    14,  # H2
    15,  # H3
    14,  # H2
    15,  # H3
    14,  # H2
    15,  # H3
    14,  # H2
    15,  # H3
    14,  # H2
    15,  # H3
    14,  # H2
    15,  # H3
    14,  # H2
    15,  # H3
    14,  # H2
    15,  # H3
    14,  # H2
    15,  # H3
    14,  # H2
    15,  # H3
    14,  # H2
    15,  # H3
    14,  # H2
    15,  # H3
    14,  # H2
    15,  # H3
    14,  # H2
    15,  # H3
    14,  # H2
    15,  # H3
    14,  # H2
    15,  # H3
    14,  # H2
    15,  # H3
    14,  # H2
    15,  # H3
    14,  # H2
    15,  # H3
    14,  # H2
    15,  # H3
    14,  # H2
    15,  # H3
    14,  # H2
    15,  # H3
    14,  # H2
    15,  # H3
    14,  # H2
    15,  # H3
    14,  # H2
    15,  # H3
    14,  # H2
    15,  # H3
    14,  # H2
    15,  # H3
    14,  # H2
    15,  # H3
    14,  # H2
    15,  # H3
    14,  # H2
    15,  # H3
    14,  # H2
    15,  # H3
    14,  # H2
    15,  # H3
    14,  # H2
    15,  # H3
    14,  # H2
    15,  # H3
    14,  # H2
    15,  # H3
    14,  # H2
    15,  # H3
    14,  # H2
    15,  # H3
    14,  # H2
    15,  # H3
    14,  # H2
    15,  # H3
    14,  # H2
    15,  # H3
    14,  # H2
    15,  # H3
    14,  # H2
    15,  # H3
    14,  # H2
    15,  # H3
    14,  # H2
    15,  # H3
    14,  # H2
    15,  # H3
    14,  # H2
    15,  # H3
    14,  # H2
    15,  # H3
    14,  # H2
    15,  # H3
    14,  # H2
    15,  # H3
    14,  # H2
    15,  # H3
    14,  # H2
    15,  # H3
    14,  # H2
    15,  # H3
    14,  # H2
    15,  # H3
    14,  # H2
    15,  # H3
    14,  # H2
    15,  # H3
    14,  # H2
    15,  # H3
    14,  # H2
    15,  # H3
    14,  # H2
    15,  # H3
    14,  # H2
    15,  # H3
    14,  # H2
    15,  # H3
    14,  # H2
    15,  # H3
    14,  # H2
    15,  # H3
    14,  # H2
    15,  # H3
    14,  # H2
    15,  # H3
    14,  # H2
    15,  # H3
    14,  # H2
    15,  # H3
    14,  # H2
    15,  # H3
    14,  # H2
    15,  # H3
    14,  # H2
    15,  # H3
    14,  # H2
    15,  # H3
    14,  # H2
    15,  # H3
    14,  # H2
    15,  # H3
    14,  # H2
    15,  # H3
    14,  # H2
    15,  # H3
    14,  # H2
    15,  # H3
    14,  # H2
    15,  # H3
    14,  # H2
    15,  # H3
    14,  # H2
    15,  # H3
    14,  # H2
    15,  # H3
    14,  # H2
    15,  # H3
    14,  # H2
    15,  # H3
    14,  # H2
    15,  # H3
    14,  # H2
    15,  # H3
    14,  # H2
    15,  # H3
    14,  # H2
    15,  # H3
    14,  # H2
    15,  # H3
    14,  # H2
    15,  # H3
    14,  # H2
    15,  # H3
    14,  # H2
    15,  # H3
    14,  # H2
    15,  # H3
    14,  # H2
    15,  # H3
    14,  # H2
    15,  # H3
    14,  # H2
    15,  # H3
    14,  # H2
    15,  # H3
    14,  # H2
    15,  # H3
    14,  # H2
    15,  # H3
    14,  # H2
    15,  # H3
    14,  # H2
    15,  # H3
    14,  # H2
    15,  # H3
    14,  # H2
    15,  # H3
    14,  # H2
    15,  # H3
    14,  # H2
    15,  # H3
    14,  # H2
    15,  # H3
    14,  # H2
    15,  # H3
    14,  # H2
    15,  # H3
    14,  # H2
    15,  # H3
    14,  # H2
    15,  # H3
    14,  # H2
    15,  # H3
    14,  # H2
    15,  # H3
    14,  # H2
    15,  # H3
    14,  # H2
    15,  # H3
    14,  # H2
    15,  # H3
    14,  # H2
    15,  # H3
    14,  # H2
    15,  # H3
    14,  # H2
    15,  # H3
    14,  # H2
    15,  # H3
    14,  # H2
    15,  # H3
    14,  # H2
    15,  # H3
    14,  # H2
    15,  # H3
    14,  # H2
    15,  # H3
    14,  # H2
    15,  # H3
    14,  # H2
    15,  # H3
    14,  # H2
    15,  # H3
    14,  # H2
    15,  # H3
    14,  # H2
    15,  # H3
    14,  # H2
    15,  # H3
    14,  # H2
    15,  # H3
    14,  # H2
    15,  # H3
    14,  # H2
    15,  # H3
    14,  # H2
    15,  # H3
    14,  # H2
    15,  # H3
    14,  # H2
    15,  # H3
    14,  # H2
    15,  # H3
    14,  # H2
    15,  # H3
    14,  # H2
    15,  # H3
    14,  # H2
    15,  # H3
    14,  # H2
    15,  # H3
    14,  # H2
    15,  # H3
    14,  # H2
    15,  # H3
    14,  # H2
    15,  # H3
    14,  # H2
    15,  # H3
    14,  # H2
    15,  # H3
    14,  # H2
    15,  # H3
    14,  # H2
    15,  # H3
    14,  # H2
    15,  # H3
    14,  # H2
    15,  # H3
    14,  # H2
    15,  # H3
    14,  # H2
    15,  # H3
    14,  # H2
    15,  # H3
    14,  # H2
    15,  # H3
    14,  # H2
    15,  # H3
    14,  # H2
    15,  # H3
    14,  # H2
    15,  # H3
    14,  # H2
    15,  # H3
    14,  # H2
    15,  # H3
    14,  # H2
    15,  # H3
    14,  # H2
    15,  # H3
    14,  # H2
    15,  # H3
    14,  # H2
    15,  # H3
    14,  # H2
    15,  # H3
    14,  # H2
    15,  # H3
    14,  # H2
    15,  # H3
    14,  # H2
    15,  # H3
    14,  # H2
    15,  # H3
    14,  # H2
    15,  # H3
    14,  # H2
    15,  # H3
    14,  # H2
    15,  # H3
    14,  # H2
    15,  # H3
    14,  # H2
    15,  # H3
    14,  # H2
    15,  # H3
    14,  # H2
    15,  # H3
    14,  # H2
    15,  # H3
    0,  # AL
    23,  # JV
    0,  # AL
    22,  # JT
    0,  # AL
    18,  # ID
    0,  # AL
    16,  # HL
    7,  # CM
    16,  # HL
    0,  # AL
    16,  # HL
    0,  # AL
    16,  # HL
    0,  # AL
    16,  # HL
    0,  # AL
    16,  # HL
    0,  # AL
    16,  # HL
    0,  # AL
    16,  # HL
    0,  # AL
    6,  # CL
    28,  # OP
    0,  # AL
    29,  # PO
    0,  # AL
    7,  # CM
    20,  # IS
    6,  # CL
    20,  # IS
    12,  # EX
    28,  # OP
    6,  # CL
    19,  # IN
    0,  # AL
    7,  # CM
    18,  # ID
    28,  # OP
    6,  # CL
    28,  # OP
    6,  # CL
    28,  # OP
    6,  # CL
    28,  # OP
    6,  # CL
    28,  # OP
    6,  # CL
    28,  # OP
    6,  # CL
    28,  # OP
    6,  # CL
    28,  # OP
    6,  # CL
    18,  # ID
    28,  # OP
    6,  # CL
    18,  # ID
    6,  # CL
    18,  # ID
    6,  # CL
    0,  # AL
    26,  # NS
    12,  # EX
    18,  # ID
    28,  # OP
    6,  # CL
    28,  # OP
    6,  # CL
    28,  # OP
    6,  # CL
    18,  # ID
    0,  # AL
    18,  # ID
    30,  # PR
    29,  # PO
    18,  # ID
    0,  # AL
    35,  # WJ
    0,  # AL
    12,  # EX
    18,  # ID
    30,  # PR
    29,  # PO
    18,  # ID
    28,  # OP
    6,  # CL
    18,  # ID
    6,  # CL
    18,  # ID
    6,  # CL
    18,  # ID
    26,  # NS
    18,  # ID
    12,  # EX
    18,  # ID
    28,  # OP
    18,  # ID
    6,  # CL
    18,  # ID
    28,  # OP
    18,  # ID
    6,  # CL
    18,  # ID
    28,  # OP
    6,  # CL
    28,  # OP
    6,  # CL
    26,  # NS
    18,  # ID
    26,  # NS
    18,  # ID
    26,  # NS
    18,  # ID
    0,  # AL
    18,  # ID
    0,  # AL
    18,  # ID
    0,  # AL
    18,  # ID
    0,  # AL
    18,  # ID
    0,  # AL
    29,  # PO
    30,  # PR
    18,  # ID
    30,  # PR
    0,  # AL
    7,  # CM
    5,  # CB
    0,  # AL
    2,  # BA
    0,  # AL
    7,  # CM
    0,  # AL
    7,  # CM
    0,  # AL
    7,  # CM
    0,  # AL
    2,  # BA
    0,  # AL
    2,  # BA
    0,  # AL
    27,  # NU
    0,  # AL
    2,  # BA
    0,  # AL
    2,  # BA
    0,  # AL
    7,  # CM
    0,  # AL
    7,  # CM
    0,  # AL
    7,  # CM
    0,  # AL
    7,  # CM
    0,  # AL
    7,  # CM
    0,  # AL
    2,  # BA
    0,  # AL
    7,  # CM
    0,  # AL
    2,  # BA
    19,  # IN
    0,  # AL
    2,  # BA
    0,  # AL
    7,  # CM
    0,  # AL
    27,  # NU
    0,  # AL
    7,  # CM
    2,  # BA
    0,  # AL
    7,  # CM
    0,  # AL
    7,  # CM
    0,  # AL
    7,  # CM
    0,  # AL
    7,  # CM
    0,  # AL
    7,  # CM
    2,  # BA
    0,  # AL
    27,  # NU
    7,  # CM
    0,  # AL
    7,  # CM
    0,  # AL
    7,  # CM
    0,  # AL
    7,  # CM
    0,  # AL
    2,  # BA
    7,  # CM
    0,  # AL
    27,  # NU
    0,  # AL
    7,  # CM
    0,  # AL
    7,  # CM
    0,  # AL
    27,  # NU
    2,  # BA
    0,  # AL
    7,  # CM
    0,  # AL
    7,  # CM
    0,  # AL
    3,  # BB
    0,  # AL
    7,  # CM
    0,  # AL
    7,  # CM
    0,  # AL
    2,  # BA
    0,  # AL
    2,  # BA
    7,  # CM
    0,  # AL
    7,  # CM
    27,  # NU
    0,  # AL
    3,  # BB
    0,  # AL
    2,  # BA
    0,  # AL
    7,  # CM
    2,  # BA
    0,  # AL
    2,  # BA
    0,  # AL
    7,  # CM
    0,  # AL
    7,  # CM
    0,  # AL
    2,  # BA
    0,  # AL
    7,  # CM
    0,  # AL
    27,  # NU
    0,  # AL
    7,  # CM
    0,  # AL
    7,  # CM
    0,  # AL
    7,  # CM
    0,  # AL
    7,  # CM
    0,  # AL
    7,  # CM
    0,  # AL
    7,  # CM
    0,  # AL
    7,  # CM
    0,  # AL
    7,  # CM
    0,  # AL
    7,  # CM
    0,  # AL
    7,  # CM
    0,  # AL
    2,  # BA
    0,  # AL
    27,  # NU
    2,  # BA
    0,  # AL
    7,  # CM
    0,  # AL
    7,  # CM
    0,  # AL
    27,  # NU
    0,  # AL
    7,  # CM
    0,  # AL
    7,  # CM
    3,  # BB
    2,  # BA
    12,  # EX
    0,  # AL
    2,  # BA
    0,  # AL
    7,  # CM
    0,  # AL
    7,  # CM
    2,  # BA
    0,  # AL
    27,  # NU
    0,  # AL
    3,  # BB
    0,  # AL
    7,  # CM
    0,  # AL
    27,  # NU
    0,  # AL
    7,  # CM
    0,  # AL
    27,  # NU
    0,  # AL
    2,  # BA
    0,  # AL
    7,  # CM
    0,  # AL
    27,  # NU
    0,  # AL
    7,  # CM
    0,  # AL
    7,  # CM
    0,  # AL
    7,  # CM
    0,  # AL
    7,  # CM
    0,  # AL
    7,  # CM
    2,  # BA
    0,  # AL
    27,  # NU
    0,  # AL
    7,  # CM
    0,  # AL
    7,  # CM
    0,  # AL
    3,  # BB
    0,  # AL
    7,  # CM
    0,  # AL
    7,  # CM
    0,  # AL
    7,  # CM
    0,  # AL
    7,  # CM
    3,  # BB
    0,  # AL
    2,  # BA
    3,  # BB
    0,  # AL
    7,  # CM
    0,  # AL
    7,  # CM
    0,  # AL
    7,  # CM
    2,  # BA
    0,  # AL
    3,  # BB
    2,  # BA
    0,  # AL
    3,  # BB
    0,  # AL
    7,  # CM
    0,  # AL
    7,  # CM
    0,  # AL
    2,  # BA
    0,  # AL
    27,  # NU
    0,  # AL
    3,  # BB
    12,  # EX
    0,  # AL
    7,  # CM
    0,  # AL
    7,  # CM
    0,  # AL
    7,  # CM
    0,  # AL
    7,  # CM
    0,  # AL
    7,  # CM
    0,  # AL
    7,  # CM
    0,  # AL
    7,  # CM
    0,  # AL
    27,  # NU
    0,  # AL
    7,  # CM
    0,  # AL
    7,  # CM
    0,  # AL
    7,  # CM
    0,  # AL
    27,  # NU
    0,  # AL
    7,  # CM
    0,  # AL
    7,  # CM
    0,  # AL
    7,  # CM
    0,  # AL
    7,  # CM
    0,  # AL
    7,  # CM
    2,  # BA
    18,  # ID
    27,  # NU
    0,  # AL
    29,  # PO
    0,  # AL
    2,  # BA
    0,  # AL
    2,  # BA
    0,  # AL
    28,  # OP
    6,  # CL
    0,  # AL
    6,  # CL
    0,  # AL
    28,  # OP
    6,  # CL
    28,  # OP
    6,  # CL
    0,  # AL
    28,  # OP
    6,  # CL
    0,  # AL
    13,  # GL
    28,  # OP
    6,  # CL
    13,  # GL
    28,  # OP
    6,  # CL
    28,  # OP
    6,  # CL
    7,  # CM
    0,  # AL
    7,  # CM
    0,  # AL
    28,  # OP
    6,  # CL
    0,  # AL
    27,  # NU
    0,  # AL
    2,  # BA
    0,  # AL
    27,  # NU
    0,  # AL
    7,  # CM
    2,  # BA
    0,  # AL
    7,  # CM
    2,  # BA
    0,  # AL
    2,  # BA
    0,  # AL
    27,  # NU
    0,  # AL
    2,  # BA
    0,  # AL
    7,  # CM
    0,  # AL
    7,  # CM
    0,  # AL
    7,  # CM
    0,  # AL
    26,  # NS
    13,  # GL
    0,  # AL
    7,  # CM
    0,  # AL
    18,  # ID
    0,  # AL
    18,  # ID
    0,  # AL
    18,  # ID
    0,  # AL
    18,  # ID
    0,  # AL
    26,  # NS
    0,  # AL
    26,  # NS
    0,  # AL
    26,  # NS
    0,  # AL
    26,  # NS
    0,  # AL
    18,  # ID
    0,  # AL
    7,  # CM
    2,  # BA
    7,  # CM
    0,  # AL
    7,  # CM
    0,  # AL
    7,  # CM
    0,  # AL
    7,  # CM
    0,  # AL
    7,  # CM
    0,  # AL
    7,  # CM
    0,  # AL
    7,  # CM
    0,  # AL
    7,  # CM
    0,  # AL
    27,  # NU
    0,  # AL
    7,  # CM
    0,  # AL
    7,  # CM
    0,  # AL
    7,  # CM
    0,  # AL
    7,  # CM
    0,  # AL
    2,  # BA
    0,  # AL
    7,  # CM
    0,  # AL
    7,  # CM
    0,  # AL
    7,  # CM
    0,  # AL
    7,  # CM
    0,  # AL
    7,  # CM
    0,  # AL
    7,  # CM
    0,  # AL
    7,  # CM
    0,  # AL
    7,  # CM
    0,  # AL
    7,  # CM
    0,  # AL
    27,  # NU
    0,  # AL
    7,  # CM
    0,  # AL
    7,  # CM
    27,  # NU
    0,  # AL
    30,  # PR
    0,  # AL
    7,  # CM
    27,  # NU
    0,  # AL
    7,  # CM
    0,  # AL
    7,  # CM
    0,  # AL
    27,  # NU
    0,  # AL
    28,  # OP
    0,  # AL
    29,  # PO
    0,  # AL
    29,  # PO
    0,  # AL
    18,  # ID
    0,  # AL
    18,  # ID
    0,  # AL
    18,  # ID
    0,  # AL
    18,  # ID
    32,  # RI
    18,  # ID
    10,  # EB
    18,  # ID
    0,  # AL
    18,  # ID
    0,  # AL
    18,  # ID
    0,  # AL
    18,  # ID
    10,  # EB
    18,  # ID
    10,  # EB
    18,  # ID
    10,  # EB
    18,  # ID
    11,  # EM
    18,  # ID
    10,  # EB
    18,  # ID
    10,  # EB
    18,  # ID
    10,  # EB
    18,  # ID
    10,  # EB
    18,  # ID
    10,  # EB
    18,  # ID
    10,  # EB
    18,  # ID
    10,  # EB
    18,  # ID
    10,  # EB
    18,  # ID
    0,  # AL
    18,  # ID
    0,  # AL
    18,  # ID
    0,  # AL
    18,  # ID
    10,  # EB
    18,  # ID
    0,  # AL
    18,  # ID
    0,  # AL
    18,  # ID
    0,  # AL
    18,  # ID
    0,  # AL
    18,  # ID
    0,  # AL
    18,  # ID
    10,  # EB
    18,  # ID
    10,  # EB
    18,  # ID
    10,  # EB
    18,  # ID
    10,  # EB
    18,  # ID
    0,  # AL
    18,  # ID
    0,  # AL
    18,  # ID
    10,  # EB
    18,  # ID
    10,  # EB
    0,  # AL
    31,  # QU
    26,  # NS
    0,  # AL
    18,  # ID
    10,  # EB
    18,  # ID
    10,  # EB
    18,  # ID
    10,  # EB
    18,  # ID
    10,  # EB
    18,  # ID
    0,  # AL
    18,  # ID
    0,  # AL
    18,  # ID
    0,  # AL
    18,  # ID
    0,  # AL
    18,  # ID
    0,  # AL
    18,  # ID
    0,  # AL
    18,  # ID
    0,  # AL
    18,  # ID
    0,  # AL
    10,  # EB
    18,  # ID
    10,  # EB
    18,  # ID
    10,  # EB
    18,  # ID
    10,  # EB
    18,  # ID
    10,  # EB
    18,  # ID
    10,  # EB
    18,  # ID
    10,  # EB
    18,  # ID
    10,  # EB
    18,  # ID
    10,  # EB
    18,  # ID
    10,  # EB
    18,  # ID
    10,  # EB
    18,  # ID
    10,  # EB
    18,  # ID
    0,  # AL
    18,  # ID
    10,  # EB
    18,  # ID
    10,  # EB
    18,  # ID
    0,  # AL
    27,  # NU
    0,  # AL
    18,  # ID
    0,  # AL
    18,  # ID
    0,  # AL
    18,  # ID
    0,  # AL
    7,  # CM
    0,  # AL
    7,  # CM
    0,  # AL
    7,  # CM
    0,  # AL
)

# OP/CP codepoints with East_Asian_Width F/W/H (excluded from LB30)
LB30_EAW_OPCP = frozenset((
    0x2329,
    0x3008,
    0x300A,
    0x300C,
    0x300E,
    0x3010,
    0x3014,
    0x3016,
    0x3018,
    0x301A,
    0x301D,
    0xFE17,
    0xFE35,
    0xFE37,
    0xFE39,
    0xFE3B,
    0xFE3D,
    0xFE3F,
    0xFE41,
    0xFE43,
    0xFE47,
    0xFE59,
    0xFE5B,
    0xFE5D,
    0xFF08,
    0xFF3B,
    0xFF5B,
    0xFF5F,
    0xFF62,
))

# Extended_Pictographic & Cn ranges (LB30b EB-base rule)
EXTPICT_CN = (
    (0x1F02C, 0x1F02F),
    (0x1F094, 0x1F09F),
    (0x1F0AF, 0x1F0B0),
    (0x1F0C0, 0x1F0C0),
    (0x1F0D0, 0x1F0D0),
    (0x1F0F6, 0x1F0FF),
    (0x1F1AE, 0x1F1E5),
    (0x1F203, 0x1F20F),
    (0x1F23C, 0x1F23F),
    (0x1F249, 0x1F24F),
    (0x1F252, 0x1F25F),
    (0x1F266, 0x1F2FF),
    (0x1F6D8, 0x1F6DB),
    (0x1F6ED, 0x1F6EF),
    (0x1F6FD, 0x1F6FF),
    (0x1F777, 0x1F77A),
    (0x1F7DA, 0x1F7DF),
    (0x1F7EC, 0x1F7EF),
    (0x1F7F1, 0x1F7FF),
    (0x1F80C, 0x1F80F),
    (0x1F848, 0x1F84F),
    (0x1F85A, 0x1F85F),
    (0x1F888, 0x1F88F),
    (0x1F8AE, 0x1F8AF),
    (0x1F8B2, 0x1F8FF),
    (0x1FA54, 0x1FA5F),
    (0x1FA6E, 0x1FA6F),
    (0x1FA7D, 0x1FA7F),
    (0x1FA89, 0x1FA8F),
    (0x1FABE, 0x1FABE),
    (0x1FAC6, 0x1FACD),
    (0x1FADC, 0x1FADF),
    (0x1FAE9, 0x1FAEF),
    (0x1FAF9, 0x1FAFF),
    (0x1FC00, 0x1FFFD),
)
