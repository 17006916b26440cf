"""Offline char/word -> toned-pinyin tables for the built-in zh G2P
fallback (the live path when pypinyin is not installed — reference uses
pypinyin, zh_frontend.py:100).

All entries are this repo's own data (standard-Mandarin citation
readings).  ``WORD_PINYIN`` is consulted first (longest match) so that
polyphonic characters (多音字: 行/长/还/乐/得/地/重/都...) resolve by
word context; ``CHAR_PINYIN`` is the per-character fallback carrying the
most frequent reading.
"""
from __future__ import annotations

# ---- word-level readings (polyphone disambiguation + common words) ----
WORD_PINYIN = {
    # 行 xing2/hang2
    "银行": "yin2 hang2", "行业": "hang2 ye4", "一行": "yi4 hang2",
    "行列": "hang2 lie4", "自行车": "zi4 xing2 che1", "行为": "xing2 wei2",
    "进行": "jin4 xing2", "流行": "liu2 xing2", "旅行": "lv3 xing2",
    # 长 chang2/zhang3
    "长大": "zhang3 da4", "成长": "cheng2 zhang3", "校长": "xiao4 zhang3",
    "长得": "zhang3 de5", "生长": "sheng1 zhang3", "长度": "chang2 du4",
    "长城": "chang2 cheng2", "长江": "chang2 jiang1",
    "队长": "dui4 zhang3", "班长": "ban1 zhang3", "市长": "shi4 zhang3",
    "长辈": "zhang3 bei4", "增长": "zeng1 zhang3",
    # 还 hai2/huan2
    "还给": "huan2 gei3", "还钱": "huan2 qian2", "归还": "gui1 huan2",
    "还书": "huan2 shu1", "还是": "hai2 shi4", "还有": "hai2 you3",
    # 乐 le4/yue4
    "音乐": "yin1 yue4", "乐器": "yue4 qi4", "快乐": "kuai4 le4",
    "乐队": "yue4 dui4", "可乐": "ke3 le4",
    # 得 de5/de2/dei3
    "得到": "de2 dao4", "获得": "huo4 de2", "取得": "qu3 de2",
    "觉得": "jue2 de5", "记得": "ji4 de5", "值得": "zhi2 de5",
    "得意": "de2 yi4", "懂得": "dong3 de5", "显得": "xian3 de5",
    # 地 de5/di4
    "地方": "di4 fang5", "地球": "di4 qiu2", "土地": "tu3 di4",
    "地图": "di4 tu2", "地铁": "di4 tie3", "地址": "di4 zhi3",
    "地面": "di4 mian4", "地区": "di4 qu1", "地点": "di4 dian3",
    "地下": "di4 xia4", "地理": "di4 li3", "地位": "di4 wei4",
    # 重 zhong4/chong2
    "重要": "zhong4 yao4", "重量": "zhong4 liang4", "体重": "ti3 zhong4",
    "重复": "chong2 fu4", "重新": "chong2 xin1", "尊重": "zun1 zhong4",
    "严重": "yan2 zhong4", "重庆": "chong2 qing4",
    # 都 dou1/du1
    "首都": "shou3 du1", "都市": "du1 shi4", "成都": "cheng2 du1",
    # 发 fa1/fa4
    "头发": "tou2 fa4", "理发": "li3 fa4", "发现": "fa1 xian4",
    "发展": "fa1 zhan3", "发生": "fa1 sheng1", "出发": "chu1 fa1",
    # 会 hui4/kuai4
    "会计": "kuai4 ji4",
    # 觉 jue2/jiao4
    "睡觉": "shui4 jiao4", "午觉": "wu3 jiao4", "感觉": "gan3 jue2",
    "觉得": "jue2 de5", "自觉": "zi4 jue2",
    # 教 jiao1/jiao4
    "教书": "jiao1 shu1", "教学": "jiao4 xue2", "教室": "jiao4 shi4",
    "教育": "jiao4 yu4", "教师": "jiao4 shi1", "请教": "qing3 jiao4",
    # 便 bian4/pian2
    "便宜": "pian2 yi5", "方便": "fang1 bian4", "顺便": "shun4 bian4",
    # 干 gan1/gan4
    "干净": "gan1 jing4", "干燥": "gan1 zao4", "干活": "gan4 huo2",
    "干部": "gan4 bu4", "能干": "neng2 gan4", "饼干": "bing3 gan1",
    # 着 zhe5/zhao2/zhuo2
    "着急": "zhao2 ji2", "着火": "zhao2 huo3", "穿着": "chuan1 zhuo2",
    "沿着": "yan2 zhe5", "接着": "jie1 zhe5",
    # 种 zhong3/zhong4
    "种树": "zhong4 shu4", "种地": "zhong4 di4", "种子": "zhong3 zi5",
    "种类": "zhong3 lei4", "播种": "bo1 zhong4",
    # 好 hao3/hao4
    "爱好": "ai4 hao4", "好奇": "hao4 qi2", "好客": "hao4 ke4",
    # 少 shao3/shao4
    "少年": "shao4 nian2", "少女": "shao4 nv3", "多少": "duo1 shao3",
    "减少": "jian3 shao3", "至少": "zhi4 shao3",
    # 为 wei2/wei4
    "因为": "yin1 wei4", "为了": "wei4 le5", "为什么": "wei4 shen2 me5",
    "成为": "cheng2 wei2", "认为": "ren4 wei2", "作为": "zuo4 wei2",
    "行为": "xing2 wei2",
    # 的 de5/di2/di4
    "目的": "mu4 di4", "的确": "di2 que4",
    # 差 cha4/cha1/chai1
    "出差": "chu1 chai1", "差别": "cha1 bie2", "差不多": "cha4 bu5 duo1",
    "差距": "cha1 ju4",
    # 假 jia3/jia4
    "放假": "fang4 jia4", "假期": "jia4 qi1", "暑假": "shu3 jia4",
    "寒假": "han2 jia4", "假如": "jia3 ru2", "假装": "jia3 zhuang1",
    # 兴 xing1/xing4
    "高兴": "gao1 xing4", "兴趣": "xing4 qu4", "兴奋": "xing1 fen4",
    # 应 ying1/ying4
    "应该": "ying1 gai1", "答应": "da1 ying5", "应用": "ying4 yong4",
    "反应": "fan3 ying4", "适应": "shi4 ying4",
    # 相 xiang1/xiang4
    "照相": "zhao4 xiang4", "相片": "xiang4 pian4", "相信": "xiang1 xin4",
    "互相": "hu4 xiang1", "相同": "xiang1 tong2",
    # quantity/aspect 过 guo4/guo5 is tone-sandhi's job; 过 stays guo4
    # 空 kong1/kong4
    "空调": "kong1 tiao2", "天空": "tian1 kong1", "有空": "you3 kong4",
    "空气": "kong1 qi4",
    # 数 shu4/shu3
    "数学": "shu4 xue2", "数字": "shu4 zi4", "数数": "shu3 shu4",
    # 弹 tan2/dan4
    "弹琴": "tan2 qin2", "子弹": "zi3 dan4", "弹钢琴": "tan2 gang1 qin2",
    # 曲 qu1/qu3
    "歌曲": "ge1 qu3", "弯曲": "wan1 qu1", "乐曲": "yue4 qu3",
    # 血 xue4/xie3
    "流血": "liu2 xue4", "血液": "xue4 ye4",
    # 宁 ning2/ning4
    "宁可": "ning4 ke3", "安宁": "an1 ning2", "宁静": "ning2 jing4",
    # 调 diao4/tiao2
    "调查": "diao4 cha2", "声调": "sheng1 diao4", "调整": "tiao2 zheng3",
    "调皮": "tiao2 pi2",
    # 背 bei1/bei4
    "背包": "bei1 bao1", "背诵": "bei4 song4", "后背": "hou4 bei4",
    # 倒 dao3/dao4
    "摔倒": "shuai1 dao3", "倒车": "dao4 che1", "倒水": "dao4 shui3",
    "倒霉": "dao3 mei2",
    # 传 chuan2/zhuan4
    "传统": "chuan2 tong3", "传说": "chuan2 shuo1", "自传": "zi4 zhuan4",
    # 朝 chao2/zhao1
    "朝阳": "chao2 yang2", "朝代": "chao2 dai4",
    # 盛 sheng4/cheng2
    "盛开": "sheng4 kai1", "盛饭": "cheng2 fan4",
    # 处 chu3/chu4
    "到处": "dao4 chu4", "处理": "chu3 li3", "好处": "hao3 chu4",
    "相处": "xiang1 chu3", "办事处": "ban4 shi4 chu4",
    # 答 da2/da1
    "回答": "hui2 da2", "答案": "da2 an4", "答应": "da1 ying5",
    # 间 jian1/jian4
    "时间": "shi2 jian1", "房间": "fang2 jian1", "中间": "zhong1 jian1",
    "间接": "jian4 jie1",
    # 当 dang1/dang4
    "当天": "dang4 tian1", "当时": "dang1 shi2", "上当": "shang4 dang4",
    "当然": "dang1 ran2", "应当": "ying1 dang1",
    # 将 jiang1/jiang4
    "将军": "jiang1 jun1", "将来": "jiang1 lai2", "麻将": "ma2 jiang4",
    # 其他常用词 (non-polyphonic; speeds up longest-match + accuracy)
    "北京": "bei3 jing1", "上海": "shang4 hai3", "中国": "zhong1 guo2",
    "谢谢": "xie4 xie5", "先生": "xian1 sheng5", "小姐": "xiao3 jie3",
    "名字": "ming2 zi5", "学校": "xue2 xiao4", "老师": "lao3 shi1",
    "同学": "tong2 xue2", "电脑": "dian4 nao3", "手机": "shou3 ji1",
    "电视": "dian4 shi4", "电影": "dian4 ying3", "杂志": "za2 zhi4",
    "报纸": "bao4 zhi3", "词典": "ci2 dian3", "桌子": "zhuo1 zi5",
    "椅子": "yi3 zi5", "房子": "fang2 zi5", "车站": "che1 zhan4",
    "飞机": "fei1 ji1", "火车": "huo3 che1", "汽车": "qi4 che1",
    "公共汽车": "gong1 gong4 qi4 che1", "出租车": "chu1 zu1 che1",
    "医院": "yi1 yuan4", "医生": "yi1 sheng1", "护士": "hu4 shi5",
    "商店": "shang1 dian4", "公司": "gong1 si1", "公园": "gong1 yuan2",
    "图书馆": "tu2 shu1 guan3", "饭馆": "fan4 guan3",
    "宾馆": "bin1 guan3", "博物馆": "bo2 wu4 guan3",
    "咖啡": "ka1 fei1", "牛奶": "niu2 nai3", "面包": "mian4 bao1",
    "鸡蛋": "ji1 dan4", "苹果": "ping2 guo3", "香蕉": "xiang1 jiao1",
    "西瓜": "xi1 gua1", "米饭": "mi3 fan4", "面条": "mian4 tiao2",
    "包子": "bao1 zi5", "饺子": "jiao3 zi5",
    "篮球": "lan2 qiu2", "足球": "zu2 qiu2", "乒乓球": "ping1 pang1 qiu2",
    "游泳": "you2 yong3", "跑步": "pao3 bu4", "运动": "yun4 dong4",
    "唱歌": "chang4 ge1", "跳舞": "tiao4 wu3", "画画": "hua4 hua4",
    "旅游": "lv3 you2", "散步": "san4 bu4",
    "春天": "chun1 tian1", "夏天": "xia4 tian1", "秋天": "qiu1 tian1",
    "冬天": "dong1 tian1", "星期": "xing1 qi1", "礼拜": "li3 bai4",
    "现在": "xian4 zai4", "已经": "yi3 jing1", "马上": "ma3 shang4",
    "刚才": "gang1 cai2", "以前": "yi3 qian2", "以后": "yi3 hou4",
    "然后": "ran2 hou4", "最后": "zui4 hou4", "突然": "tu1 ran2",
    "虽然": "sui1 ran2", "但是": "dan4 shi4", "可是": "ke3 shi4",
    "因此": "yin1 ci3", "所以": "suo3 yi3", "如果": "ru2 guo3",
    "要是": "yao4 shi5", "或者": "huo4 zhe3", "而且": "er2 qie3",
    "不过": "bu2 guo4", "其实": "qi2 shi2", "当然": "dang1 ran2",
    "一定": "yi2 ding4", "一共": "yi2 gong4", "一直": "yi4 zhi2",
    "一般": "yi4 ban1", "一些": "yi4 xie1", "有点": "you3 dian3",
    "非常": "fei1 chang2", "特别": "te4 bie2", "比较": "bi3 jiao4",
    "更加": "geng4 jia1", "十分": "shi2 fen1", "完全": "wan2 quan2",
    # time-of-day words read with neutral 上 (standard 轻声 readings the
    # POS-based locative rule cannot see)
    "早上": "zao3 shang5", "晚上": "wan3 shang5", "身上": "shen1 shang5",
    "上午": "shang4 wu3", "下午": "xia4 wu3", "中午": "zhong1 wu3",
    "漂亮": "piao4 liang5", "东北": "dong1 bei3", "西北": "xi1 bei3",
    "东南": "dong1 nan2", "西南": "xi1 nan2",
}

# ---- extra per-character readings (most frequent reading) -------------
CHAR_PINYIN_EXTRA = {
    # family/people
    "哥": "ge1", "弟": "di4", "妹": "mei4", "姐": "jie3", "奶": "nai3",
    "爷": "ye2", "叔": "shu1", "姨": "yi2", "舅": "jiu4", "婆": "po2",
    "孙": "sun1", "童": "tong2", "宾": "bin1", "客": "ke4", "友": "you3",
    "邻": "lin2", "居": "ju1", "民": "min2", "众": "zhong4", "佛": "fo2",
    # body
    "脸": "lian3", "嘴": "zui3", "鼻": "bi2", "耳": "er3", "肩": "jian1",
    "背": "bei4", "腰": "yao1", "腿": "tui3", "脚": "jiao3", "臂": "bi4",
    "胸": "xiong1", "肚": "du4", "血": "xue4", "骨": "gu3", "肉": "rou4",
    "皮": "pi2", "牙": "ya2", "舌": "she2", "喉": "hou2", "脑": "nao3",
    "额": "e2", "眉": "mei2", "睛": "jing1", "指": "zhi3", "拳": "quan2",
    # nature
    "秋": "qiu1", "冬": "dong1", "夏": "xia4", "春": "chun1",
    "雪": "xue3", "雷": "lei2", "雾": "wu4", "霜": "shuang1",
    "冰": "bing1", "河": "he2", "湖": "hu2", "江": "jiang1",
    "池": "chi2", "岛": "dao3", "岸": "an4", "沙": "sha1", "泥": "ni2",
    "石": "shi2", "岩": "yan2", "坡": "po1", "谷": "gu3", "洞": "dong4",
    "森": "sen1", "林": "lin2", "树": "shu4", "枝": "zhi1", "叶": "ye4",
    "草": "cao3", "根": "gen1", "籽": "zi3", "芽": "ya2", "苗": "miao2",
    "稻": "dao4", "麦": "mai4", "豆": "dou4", "瓜": "gua1", "菜": "cai4",
    "葱": "cong1", "蒜": "suan4", "椒": "jiao1", "梨": "li2",
    "桃": "tao2", "杏": "xing4", "枣": "zao3", "莓": "mei2",
    "橘": "ju2", "橙": "cheng2", "柚": "you4", "柿": "shi4",
    # animals
    "牛": "niu2", "羊": "yang2", "猪": "zhu1", "鸡": "ji1", "鸭": "ya1",
    "鹅": "e2", "兔": "tu4", "虎": "hu3", "狮": "shi1", "象": "xiang4",
    "熊": "xiong2", "猴": "hou2", "蛇": "she2", "龙": "long2",
    "凤": "feng4", "鹰": "ying1", "雀": "que4", "鸽": "ge1",
    "蚊": "wen2", "蝇": "ying2", "蜂": "feng1", "蝶": "die2",
    "虾": "xia1", "蟹": "xie4", "鲸": "jing1", "猫": "mao1",
    "狗": "gou3", "鼠": "shu3", "驴": "lv2", "骡": "luo2", "鹿": "lu4",
    "狼": "lang2", "狐": "hu2", "猩": "xing1", "鸦": "ya1",
    # food & drink
    "茶": "cha2", "酒": "jiu3", "汤": "tang1", "糖": "tang2",
    "盐": "yan2", "醋": "cu4", "酱": "jiang4", "油": "you2",
    "蛋": "dan4", "奶": "nai3", "粥": "zhou1", "饼": "bing3",
    "糕": "gao1", "馅": "xian4", "零": "ling2", "餐": "can1",
    "宴": "yan4", "厨": "chu2", "炒": "chao3", "煮": "zhu3",
    "蒸": "zheng1", "烤": "kao3", "炸": "zha2", "煎": "jian1",
    "拌": "ban4", "切": "qie1", "洗": "xi3", "尝": "chang2",
    "喝": "he1", "吞": "tun1", "咬": "yao3", "嚼": "jiao2",
    # objects
    "桌": "zhuo1", "椅": "yi3", "床": "chuang2", "柜": "gui4",
    "架": "jia4", "箱": "xiang1", "袋": "dai4", "瓶": "ping2",
    "罐": "guan4", "壶": "hu2", "碗": "wan3", "盘": "pan2",
    "筷": "kuai4", "勺": "shao2", "刀": "dao1", "叉": "cha1",
    "杯": "bei1", "镜": "jing4", "伞": "san3", "钟": "zhong1",
    "表": "biao3", "灯": "deng1", "扇": "shan4", "炉": "lu2",
    "锅": "guo1", "盆": "pen2", "桶": "tong3", "篮": "lan2",
    "绳": "sheng2", "针": "zhen1", "剪": "jian3", "锤": "chui2",
    "钉": "ding1", "锁": "suo3", "钥": "yao4", "匙": "shi5",
    "梯": "ti1", "轮": "lun2", "帆": "fan1", "锚": "mao2",
    "旗": "qi2", "鼓": "gu3", "琴": "qin2", "笛": "di2",
    "纸": "zhi3", "笔": "bi3", "墨": "mo4", "砚": "yan4",
    "尺": "chi3", "胶": "jiao1", "夹": "jia1", "册": "ce4",
    "卡": "ka3", "币": "bi4", "钞": "chao1", "票": "piao4",
    "券": "quan4", "戒": "jie4", "环": "huan2", "链": "lian4",
    "珠": "zhu1", "宝": "bao3", "玉": "yu4", "银": "yin2",
    "铜": "tong2", "铁": "tie3", "钢": "gang1", "铝": "lv3",
    "玻": "bo1", "璃": "li5", "砖": "zhuan1", "瓦": "wa3",
    "泥": "ni2", "漆": "qi1", "布": "bu4", "绸": "chou2",
    "棉": "mian2", "麻": "ma2", "丝": "si1", "线": "xian4",
    "衫": "shan1", "裙": "qun2", "裤": "ku4", "袜": "wa4",
    "鞋": "xie2", "帽": "mao4", "领": "ling3", "袖": "xiu4",
    "扣": "kou4", "兜": "dou1", "巾": "jin1", "毯": "tan3",
    "被": "bei4", "枕": "zhen3", "帘": "lian2", "幕": "mu4",
    # places & buildings
    "馆": "guan3", "店": "dian4", "厂": "chang3", "场": "chang3",
    "厅": "ting1", "室": "shi4", "楼": "lou2", "层": "ceng2",
    "梯": "ti1", "院": "yuan4", "墙": "qiang2", "窗": "chuang1",
    "顶": "ding3", "梁": "liang2", "柱": "zhu4", "栏": "lan2",
    "桥": "qiao2", "街": "jie1", "巷": "xiang4", "路": "lu4",
    "途": "tu2", "径": "jing4", "寺": "si4", "庙": "miao4",
    "塔": "ta3", "城": "cheng2", "乡": "xiang1", "村": "cun1",
    "镇": "zhen4", "县": "xian4", "省": "sheng3", "区": "qu1",
    "址": "zhi3", "郊": "jiao1", "境": "jing4", "界": "jie4",
    # verbs
    "跑": "pao3", "跳": "tiao4", "爬": "pa2", "站": "zhan4",
    "坐": "zuo4", "躺": "tang3", "蹲": "dun1", "踢": "ti1",
    "踩": "cai3", "推": "tui1", "拉": "la1", "抬": "tai2",
    "搬": "ban1", "扛": "kang2", "提": "ti2", "扔": "reng1",
    "捡": "jian3", "摘": "zhai1", "抱": "bao4", "搂": "lou3",
    "握": "wo4", "摸": "mo1", "拍": "pai1", "敲": "qiao1",
    "挂": "gua4", "贴": "tie1", "铺": "pu1", "盖": "gai4",
    "藏": "cang2", "躲": "duo3", "逃": "tao2", "追": "zhui1",
    "赶": "gan3", "催": "cui1", "等": "deng3", "陪": "pei2",
    "送": "song4", "接": "jie1", "迎": "ying2", "邀": "yao1",
    "访": "fang3", "拜": "bai4", "劝": "quan4", "求": "qiu2",
    "借": "jie4", "赔": "pei2", "赚": "zhuan4", "赢": "ying2",
    "输": "shu1", "偷": "tou1", "抢": "qiang3", "骗": "pian4",
    "骂": "ma4", "吵": "chao3", "闹": "nao4", "哭": "ku1",
    "喊": "han3", "叫": "jiao4", "吼": "hou3", "吹": "chui1",
    "咳": "ke2", "喘": "chuan3", "吻": "wen3", "抿": "min3",
    "眨": "zha3", "瞪": "deng4", "瞧": "qiao2", "盯": "ding1",
    "望": "wang4", "瞅": "chou3", "闻": "wen2", "嗅": "xiu4",
    "听": "ting1", "想": "xiang3", "猜": "cai1", "疑": "yi2",
    "信": "xin4", "懂": "dong3", "忘": "wang4", "记": "ji4",
    "背": "bei4", "抄": "chao1", "练": "lian4", "复": "fu4",
    "预": "yu4", "习": "xi2", "考": "kao3", "测": "ce4",
    "查": "cha2", "检": "jian3", "验": "yan4", "试": "shi4",
    "修": "xiu1", "补": "bu3", "造": "zao4", "建": "jian4",
    "盖": "gai4", "拆": "chai1", "装": "zhuang1", "卸": "xie4",
    "挖": "wa1", "埋": "mai2", "浇": "jiao1", "灌": "guan4",
    "晒": "shai4", "烘": "hong1", "冻": "dong4", "融": "rong2",
    "烧": "shao1", "灭": "mie4", "熄": "xi1", "燃": "ran2",
    "飘": "piao1", "浮": "fu2", "沉": "chen2", "漂": "piao1",
    "流": "liu2", "滴": "di1", "洒": "sa3", "泼": "po1",
    "淋": "lin2", "泡": "pao4", "浸": "jin4", "涨": "zhang3",
    "退": "tui4", "升": "sheng1", "降": "jiang4", "落": "luo4",
    "掉": "diao4", "丢": "diu1", "失": "shi1", "寻": "xun2",
    "找": "zhao3", "获": "huo4", "救": "jiu4", "帮": "bang1",
    "扶": "fu2", "搀": "chan1", "护": "hu4", "守": "shou3",
    "防": "fang2", "攻": "gong1", "打": "da3", "斗": "dou4",
    "争": "zheng1", "抗": "kang4", "胜": "sheng4", "败": "bai4",
    "退": "tui4", "逼": "bi1", "迫": "po4", "压": "ya1",
    "挤": "ji3", "碰": "peng4", "撞": "zhuang4", "摔": "shuai1",
    "跌": "die1", "滑": "hua2", "绊": "ban4", "扭": "niu3",
    "伤": "shang1", "疼": "teng2", "痛": "tong4", "痒": "yang3",
    "晕": "yun1", "吐": "tu4", "泻": "xie4", "肿": "zhong3",
    "瘦": "shou4", "胖": "pang4", "病": "bing4", "医": "yi1",
    "治": "zhi4", "养": "yang3", "休": "xiu1", "睡": "shui4",
    "醒": "xing3", "梦": "meng4", "歇": "xie1", "躺": "tang3",
    # adjectives
    "冷": "leng3", "热": "re4", "暖": "nuan3", "凉": "liang2",
    "湿": "shi1", "干": "gan1", "脏": "zang1", "净": "jing4",
    "乱": "luan4", "齐": "qi2", "宽": "kuan1", "窄": "zhai3",
    "厚": "hou4", "薄": "bao2", "粗": "cu1", "细": "xi4",
    "尖": "jian1", "钝": "dun4", "硬": "ying4", "软": "ruan3",
    "松": "song1", "紧": "jin3", "斜": "xie2", "歪": "wai1",
    "弯": "wan1", "曲": "qu1", "扁": "bian3", "圆": "yuan2",
    "方": "fang1", "平": "ping2", "陡": "dou3", "稳": "wen3",
    "牢": "lao2", "脆": "cui4", "嫩": "nen4", "鲜": "xian1",
    "甜": "tian2", "酸": "suan1", "苦": "ku3", "辣": "la4",
    "咸": "xian2", "淡": "dan4", "浓": "nong2", "香": "xiang1",
    "臭": "chou4", "腥": "xing1", "闷": "men1", "爽": "shuang3",
    "轻": "qing1", "沉": "chen2", "贵": "gui4", "贱": "jian4",
    "富": "fu4", "穷": "qiong2", "贫": "pin2", "豪": "hao2",
    "傲": "ao4", "谦": "qian1", "诚": "cheng2", "假": "jia3",
    "真": "zhen1", "懒": "lan3", "勤": "qin2", "笨": "ben4",
    "聪": "cong1", "呆": "dai1", "傻": "sha3", "疯": "feng1",
    "凶": "xiong1", "狠": "hen3", "善": "shan4", "恶": "e4",
    "勇": "yong3", "怯": "qie4", "慌": "huang1", "镇": "zhen4",
    "急": "ji2", "缓": "huan3", "忙": "mang2", "闲": "xian2",
    "累": "lei4", "乏": "fa2", "饿": "e4", "饱": "bao3",
    "渴": "ke3", "困": "kun4", "醉": "zui4", "晃": "huang4",
    # abstract / misc
    "梦": "meng4", "魂": "hun2", "鬼": "gui3", "仙": "xian1",
    "妖": "yao1", "怪": "guai4", "灵": "ling2", "秘": "mi4",
    "谜": "mi2", "奇": "qi2", "妙": "miao4", "巧": "qiao3",
    "幻": "huan4", "虚": "xu1", "实": "shi2", "真": "zhen1",
    "伪": "wei3", "诡": "gui3", "谎": "huang3", "誓": "shi4",
    "诺": "nuo4", "愿": "yuan4", "盼": "pan4", "恨": "hen4",
    "仇": "chou2", "怨": "yuan4", "愁": "chou2", "烦": "fan2",
    "恼": "nao3", "怒": "nu4", "惊": "jing1", "吓": "xia4",
    "恐": "kong3", "惧": "ju4", "忧": "you1", "虑": "lv4",
    "悲": "bei1", "哀": "ai1", "惨": "can3", "怜": "lian2",
    "惜": "xi1", "慕": "mu4", "羡": "xian4", "妒": "du4",
    "嫉": "ji2", "耻": "chi3", "辱": "ru3", "荣": "rong2",
    "誉": "yu4", "益": "yi4", "损": "sun3", "害": "hai4",
    "祸": "huo4", "灾": "zai1", "难": "nan2", "险": "xian3",
    "危": "wei1", "安": "an1", "吉": "ji2", "祥": "xiang2",
    "福": "fu2", "寿": "shou4", "禄": "lu4", "喜": "xi3",
    "庆": "qing4", "贺": "he4", "祝": "zhu4", "祈": "qi2",
    "祷": "dao3", "敬": "jing4", "孝": "xiao4", "忠": "zhong1",
    "义": "yi4", "仁": "ren2", "礼": "li3", "智": "zhi4",
    "德": "de2", "品": "pin3", "质": "zhi4", "胆": "dan3",
    "志": "zhi4", "毅": "yi4", "恒": "heng2",
    "责": "ze2", "任": "ren4", "务": "wu4", "职": "zhi2",
    "权": "quan2", "利": "li4", "法": "fa3", "规": "gui1",
    "律": "lv4", "章": "zhang1", "制": "zhi4", "度": "du4",
    "政": "zheng4", "策": "ce4", "令": "ling4", "案": "an4",
    "判": "pan4", "审": "shen3", "罚": "fa2", "罪": "zui4",
    "狱": "yu4", "警": "jing3", "军": "jun1", "兵": "bing1",
    "将": "jiang1", "帅": "shuai4", "战": "zhan4", "役": "yi4",
    "枪": "qiang1", "炮": "pao4", "弹": "dan4", "箭": "jian4",
    "盾": "dun4", "甲": "jia3", "营": "ying2", "阵": "zhen4",
    "敌": "di2", "俘": "fu2", "胜": "sheng4", "旗": "qi2",
    # common function/frequent chars beyond the base table
    "呀": "ya5", "哇": "wa5", "啦": "la5", "嘛": "ma5", "哎": "ai1",
    "哦": "o5", "喂": "wei2", "嗯": "en4", "唉": "ai1", "嘿": "hei1",
    "哈": "ha1", "嘻": "xi1", "呵": "he1", "哼": "heng1",
    "吧": "ba5", "吗": "ma5", "呢": "ne5", "啊": "a5",
    "阿": "a1", "呜": "wu1", "咚": "dong1", "啪": "pa1",
    "嗡": "weng1", "隆": "long2", "轰": "hong1", "砰": "peng1",
    "咔": "ka1", "嗒": "da1", "滴": "di1", "答": "da2",
    "玩": "wan2", "耍": "shua3", "逗": "dou4", "乐": "le4",
    "笑": "xiao4", "嘻": "xi1", "幽": "you1", "默": "mo4",
    "趣": "qu4", "味": "wei4", "彩": "cai3", "颜": "yan2",
    "绿": "lv4", "蓝": "lan2", "紫": "zi3", "灰": "hui1",
    "棕": "zong1", "褐": "he4", "粉": "fen3", "橙": "cheng2",
    "银": "yin2", "洁": "jie2", "艳": "yan4", "丽": "li4",
    "雅": "ya3", "秀": "xiu4", "俊": "jun4", "帅": "shuai4",
    "丑": "chou3", "陋": "lou4", "貌": "mao4", "姿": "zi1",
    "态": "tai4", "妆": "zhuang1", "扮": "ban4", "饰": "shi4",
    "素": "su4", "朴": "pu3", "华": "hua2", "奢": "she1",
    "俭": "jian3", "省": "sheng3", "费": "fei4", "耗": "hao4",
    "支": "zhi1", "付": "fu4", "收": "shou1", "纳": "na4",
    "缴": "jiao3", "欠": "qian4", "债": "zhai4", "账": "zhang4",
    "购": "gou4", "销": "xiao1", "售": "shou4", "租": "zu1",
    "贸": "mao4", "商": "shang1", "货": "huo4", "价": "jia4",
    "值": "zhi2", "税": "shui4", "财": "cai2", "产": "chan3",
    "资": "zi1", "本": "ben3", "息": "xi1", "股": "gu3",
    "市": "shi4", "营": "ying2", "企": "qi3", "厂": "chang3",
    "牌": "pai2", "标": "biao1", "志": "zhi4", "签": "qian1",
    "印": "yin4", "戳": "chuo1", "封": "feng1", "邮": "you2",
    "递": "di4", "寄": "ji4", "汇": "hui4", "转": "zhuan3",
    "传": "chuan2", "递": "di4", "网": "wang3", "络": "luo4",
    "链": "lian4", "码": "ma3", "号": "hao4", "位": "wei4",
    "址": "zhi3", "索": "suo3", "搜": "sou1", "查": "cha2",
    "录": "lu4", "输": "shu1", "存": "cun2", "储": "chu3",
    "删": "shan1", "改": "gai3", "设": "she4", "置": "zhi4",
    "键": "jian4", "屏": "ping2", "幕": "mu4", "页": "ye4",
    "汉": "han4", "葡": "pu2", "萄": "tao2", "唱": "chang4",
    "歌": "ge1", "景": "jing3", "亮": "liang4", "哪": "na3",
    "旁": "pang2", "操": "cao1", "舞": "wu3", "剧": "ju4",
    "戏": "xi4", "演": "yan3", "奏": "zou4", "赛": "sai4",
    "呼": "hu1", "吸": "xi1", "噪": "zao4", "静": "jing4",
    "响": "xiang3", "韵": "yun4", "诗": "shi1", "词": "ci2",
    "句": "ju4", "段": "duan4", "篇": "pian1", "故": "gu4",
    "典": "dian3", "史": "shi3", "古": "gu3", "今": "jin1",
    "未": "wei4", "曾": "ceng2", "即": "ji2", "既": "ji4",
    "且": "qie3", "或": "huo4", "若": "ruo4", "则": "ze2",
    "虽": "sui1", "尽": "jin3", "仍": "reng2", "却": "que4",
    "仅": "jin3", "皆": "jie1", "均": "jun1", "亦": "yi4",
    "爸": "ba4", "雨": "yu3", "助": "zhu4", "件": "jian4",
    "班": "ban1", "组": "zu3", "团": "tuan2", "队": "dui4",
    "衣": "yi1", "服": "fu2", "昨": "zuo2", "晨": "chen2",
    "夜": "ye4", "宵": "xiao1", "晚": "wan3", "迟": "chi2",
    "早": "zao3", "初": "chu1", "末": "mo4", "终": "zhong1",
    "始": "shi3", "久": "jiu3", "永": "yong3", "暂": "zan4",
}

# non-Chinese keys are data corruption; fail loudly instead of silently
# dropping entries (a dropped reading degrades G2P with no signal)
_bad = ([k for k in WORD_PINYIN if not all("一" <= c <= "鿿" for c in k)]
        + [k for k in CHAR_PINYIN_EXTRA
           if len(k) != 1 or not "一" <= k <= "鿿"])
assert not _bad, f"corrupted pinyin table keys: {_bad!r}"
del _bad
