# Python replica of nltk.sentiment.vader (Hutto & Gilbert 2014) control
# flow — used ONLY to generate the committed differential corpus
# (src/test/resources/vader_differential.jsonl).
#
# Provenance: hand-written from the published VADER algorithm (MIT) and
# the nltk 3.8.1 vader.py control flow, NOT by running nltk itself (this
# sandbox has no egress / no nltk). Pinned against the PUBLISHED example
# compounds in VaderSpec (0.4404, 0.3832, 0.431, 0.8316, ...), which
# hold algorithm + lexicon values to the published outputs. Any quirk
# mis-transcribed here propagates to both sides of the differential —
# the published-example goldens are the independent anchor.
# Reads the SAME lexicon resource the Scala engine bundles.
import math, re, string
from itertools import product

B_INCR, B_DECR, C_INCR, N_SCALAR = 0.293, -0.293, 0.733, -0.74
NEGATE = {"aint","arent","cannot","cant","couldnt","darent","didnt","doesnt",
 "ain't","aren't","can't","couldn't","daren't","didn't","doesn't","dont",
 "hadnt","hasnt","havent","isnt","mightnt","mustnt","neither","don't",
 "hadn't","hasn't","haven't","isn't","mightn't","mustn't","neednt","needn't",
 "never","none","nope","nor","not","nothing","nowhere","oughtnt","shant",
 "shouldnt","uhuh","wasnt","werent","oughtn't","shan't","shouldn't","uh-uh",
 "wasn't","weren't","without","wont","wouldnt","won't","wouldn't","rarely",
 "seldom","despite"}
BOOSTER_DICT = {w: B_INCR for w in ["absolutely","amazingly","awfully","completely","considerably","decidedly","deeply","effing","enormously","entirely","especially","exceptionally","extremely","fabulously","flipping","flippin","fricking","frickin","frigging","friggin","fully","fucking","greatly","hella","highly","hugely","incredibly","intensely","majorly","more","most","particularly","purely","quite","really","remarkably","so","substantially","thoroughly","totally","tremendously","uber","unbelievably","unusually","utterly","very"]}
BOOSTER_DICT.update({w: B_DECR for w in ["almost","barely","hardly","just enough","kind of","kinda","kindof","kind-of","less","little","marginal","marginally","occasional","occasionally","partly","scarce","scarcely","slight","slightly","somewhat","sort of","sorta","sortof","sort-of"]})
SPECIAL_CASE_IDIOMS = {"the shit": 3, "the bomb": 3, "bad ass": 1.5, "yeah right": -2, "cut the mustard": 2, "kiss of death": -1.5, "hand to mouth": -2}
PUNC_LIST = [".", "!", "?", ",", ";", ":", "-", "'", "\"", "!!", "!!!", "??", "???", "?!?", "!?!", "?!?!", "!?!?"]
REGEX_REMOVE_PUNCTUATION = re.compile(f"[{re.escape(string.punctuation)}]")
LEXICON = {}
import os
_LEX = os.path.join(os.path.dirname(__file__), '..', 'src', 'main', 'resources', 'vader_lexicon_subset.txt')
for line in open(_LEX):
    line=line.strip()
    if not line: continue
    wv = line.rsplit(' ',1)
    LEXICON[wv[0]] = float(wv[1])

def negated(input_words, include_nt=True):
    input_words = [str(w).lower() for w in input_words]
    if any(w in NEGATE for w in input_words): return True
    if include_nt and any("n't" in w for w in input_words): return True
    return False

def normalize(score, alpha=15):
    norm = score / math.sqrt(score*score + alpha)
    return max(-1.0, min(1.0, norm))

def allcap_differential(words):
    allcap = sum(1 for w in words if w.isupper())
    cap_diff = len(words) - allcap
    return 0 < cap_diff < len(words)

def scalar_inc_dec(word, valence, is_cap_diff):
    scalar = 0.0
    wl = word.lower()
    if wl in BOOSTER_DICT:
        scalar = BOOSTER_DICT[wl]
        if valence < 0: scalar *= -1
        if word.isupper() and is_cap_diff:
            scalar += C_INCR if valence > 0 else -C_INCR
    return scalar

class SentiText:
    def __init__(self, text):
        self.text = text
        self.words_and_emoticons = self._words_and_emoticons()
        self.is_cap_diff = allcap_differential(self.words_and_emoticons)
    def _words_plus_punc(self):
        no_punc = REGEX_REMOVE_PUNCTUATION.sub('', self.text)
        words_only = set(w for w in no_punc.split() if len(w) > 1)
        d = {''.join(p): p[1] for p in product(PUNC_LIST, words_only)}
        d.update({''.join(p): p[0] for p in product(words_only, PUNC_LIST)})
        return d
    def _words_and_emoticons(self):
        wes = [w for w in self.text.split() if len(w) > 1]
        d = self._words_plus_punc()
        return [d.get(w, w) for w in wes]

class SIA:
    def polarity_scores(self, text):
        st = SentiText(text)
        sentiments = []
        w = st.words_and_emoticons
        for item in w:
            valence = 0
            i = w.index(item)
            if (i < len(w)-1 and item.lower()=="kind" and w[i+1].lower()=="of") or item.lower() in BOOSTER_DICT:
                sentiments.append(valence); continue
            sentiments = self.sentiment_valence(valence, st, item, i, sentiments)
        sentiments = self._but_check(w, sentiments)
        return self.score_valence(sentiments, text)
    def sentiment_valence(self, valence, st, item, i, sentiments):
        w = st.words_and_emoticons
        il = item.lower()
        if il in LEXICON:
            valence = LEXICON[il]
            if item.isupper() and st.is_cap_diff:
                valence += C_INCR if valence > 0 else -C_INCR
            for start_i in range(0,3):
                if i > start_i and w[i-(start_i+1)].lower() not in LEXICON:
                    s = scalar_inc_dec(w[i-(start_i+1)], valence, st.is_cap_diff)
                    if start_i == 1 and s != 0: s *= 0.95
                    if start_i == 2 and s != 0: s *= 0.9
                    valence += s
                    valence = self._never_check(valence, w, start_i, i)
                    if start_i == 2:
                        valence = self._idioms_check(valence, w, i)
            valence = self._least_check(valence, w, i)
        sentiments.append(valence)
        return sentiments
    def _least_check(self, valence, w, i):
        if i > 1 and w[i-1].lower() not in LEXICON and w[i-1].lower() == "least":
            if w[i-2].lower() != "at" and w[i-2].lower() != "very":
                valence *= N_SCALAR
        elif i > 0 and w[i-1].lower() not in LEXICON and w[i-1].lower() == "least":
            valence *= N_SCALAR
        return valence
    def _but_check(self, w, sentiments):
        if 'but' in w or 'BUT' in w:
            try: bi = w.index('but')
            except ValueError: bi = w.index('BUT')
            for sentiment in sentiments:
                si = sentiments.index(sentiment)
                if si < bi:
                    sentiments.pop(si); sentiments.insert(si, sentiment*0.5)
                elif si > bi:
                    sentiments.pop(si); sentiments.insert(si, sentiment*1.5)
        return sentiments
    def _idioms_check(self, valence, w, i):
        lw = w  # nltk 3.8.1 compares tokens AS-IS (case-sensitive)
        onezero = f"{lw[i-1]} {lw[i]}"
        twoonezero = f"{lw[i-2]} {lw[i-1]} {lw[i]}"
        twoone = f"{lw[i-2]} {lw[i-1]}"
        threetwoone = f"{lw[i-3]} {lw[i-2]} {lw[i-1]}"
        threetwo = f"{lw[i-3]} {lw[i-2]}"
        for seq in [onezero, twoonezero, twoone, threetwoone, threetwo]:
            if seq in SPECIAL_CASE_IDIOMS:
                valence = SPECIAL_CASE_IDIOMS[seq]; break
        if len(w)-1 > i:
            zeroone = f"{lw[i]} {lw[i+1]}"
            if zeroone in SPECIAL_CASE_IDIOMS: valence = SPECIAL_CASE_IDIOMS[zeroone]
        if len(w)-1 > i+1:
            zeroonetwo = f"{lw[i]} {lw[i+1]} {lw[i+2]}"
            if zeroonetwo in SPECIAL_CASE_IDIOMS: valence = SPECIAL_CASE_IDIOMS[zeroonetwo]
        if threetwo in BOOSTER_DICT or twoone in BOOSTER_DICT:
            valence += B_DECR
        return valence
    def _never_check(self, valence, w, start_i, i):
        if start_i == 0:
            if negated([w[i-1]]): valence *= N_SCALAR
        if start_i == 1:
            if w[i-2] == "never" and (w[i-1] == "so" or w[i-1] == "this"):
                valence *= 1.5
            elif negated([w[i-(start_i+1)]]): valence *= N_SCALAR
        if start_i == 2:
            if (w[i-3] == "never" and (w[i-2] == "so" or w[i-2] == "this")) or (w[i-1] == "so" or w[i-1] == "this"):
                valence *= 1.25
            elif negated([w[i-(start_i+1)]]): valence *= N_SCALAR
        return valence
    def _punctuation_emphasis(self, text):
        ep = min(text.count("!"), 4) * 0.292
        qm_count = text.count("?")
        qm = 0.0
        if qm_count > 1:
            qm = qm_count*0.18 if qm_count <= 3 else 0.96
        return ep + qm
    def score_valence(self, sentiments, text):
        if sentiments:
            sum_s = float(sum(sentiments))
            punct = self._punctuation_emphasis(text)
            if sum_s > 0: sum_s += punct
            elif sum_s < 0: sum_s -= punct
            compound = normalize(sum_s)
            pos_sum = sum(s+1 for s in sentiments if s > 0)
            neg_sum = sum(s-1 for s in sentiments if s < 0)
            neu = sum(1 for s in sentiments if s == 0)
            if pos_sum > math.fabs(neg_sum): pos_sum += punct
            elif pos_sum < math.fabs(neg_sum): neg_sum -= punct
            total = pos_sum + math.fabs(neg_sum) + neu
            return {"neg": round(math.fabs(neg_sum/total),3), "neu": round(math.fabs(neu/total),3),
                    "pos": round(math.fabs(pos_sum/total),3), "compound": round(compound,4)}
        return {"neg":0.0,"neu":0.0,"pos":0.0,"compound":0.0}
