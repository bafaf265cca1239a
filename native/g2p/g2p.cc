// Clean-room English letter-to-sound rule engine (C++17, no deps).
//
// Replaces the reference's english2phoneme C program
// (tools/english2phoneme, driven by sedit_inference.py:263-298 and
// align_english.py:69-98) for out-of-vocabulary words.  Uses the classic
// NRL-style context-sensitive rewrite formalism (public-domain 1976 NRL
// report): each rule is  left-context [ match ] right-context = phones,
// with context meta-symbols:
//
//   #  word boundary            :  zero or more consonants
//   ^  exactly one consonant    +  a front vowel (E, I, Y)
//   .  a voiced consonant       %  a suffix (E, ER, ES, ED, ELY, ING)
//   $  one vowel                &  one or more vowels
//
// The rule tables below are original (not copied from the reference);
// output is ARPAbet with stress digits matching the post-processed form the
// A3T pipeline expects (AH0 for schwa, default stress 1 on full vowels).

#include <cctype>
#include <cstring>
#include <string>
#include <vector>

namespace {

struct Rule {
  const char* left;
  const char* match;
  const char* right;
  const char* phones;
};

bool is_vowel(char c) {
  return c == 'A' || c == 'E' || c == 'I' || c == 'O' || c == 'U';
}
bool is_cons(char c) { return c >= 'A' && c <= 'Z' && !is_vowel(c); }
bool is_front(char c) { return c == 'E' || c == 'I' || c == 'Y'; }
bool is_voiced(char c) {
  return std::strchr("BDVGJLMNRWZ", c) != nullptr;
}

// Rules are grouped per first letter of `match`; within a group the first
// matching rule wins, so specific patterns precede general ones.  A final
// single-letter default must exist for every letter.
const Rule kRules[] = {
    // --- A ---
    {"", "ATION", "#", "EY1 SH AH0 N"},  // nation, alteration
    {"", "ATION", "S#", "EY1 SH AH0 N"},  // abbreviations, aberrations
    {"&:^", "ABLE", "#", "AH0 B AH0 L"},  // reasonable, capable
    {"&:^", "ABLE", "S#", "AH0 B AH0 L"},  // miserables
    {"", "ABLE", "", "EY1 B AH0 L"},  // tablet, ablest, gabler
    {"&:^", "AGE", "#", "IH0 JH"},   // savage, village
    {"&:^", "AGE", "S#", "IH0 JH"},  // villages
    {"&:^", "AG", "E^", "IH0 JH"},   // manager, engagement, advantaged —
                                     // the e stays to sound on its own
    {"U", "AGE", "#", "IH0 JH"},    // language
    {"&:^", "AL", "#", "AH0 L"},    // monsoonal, total
    {"", "ALK", "", "AO1 K"},   // talk, walk, falkner (binary drops the l
                                // everywhere: malkin, alkaline)
    {"", "AIR", "", "EH1 R"},
    {"", "AI", "", "EY1"},
    {"", "AYE", "", "EY1 IH0"},  // hayes, played, frayer, layer
    {"", "AY", "", "EY1"},
    {"", "AU", "", "AO1"},
    {"#", "A", "L$", "AH0"},    // along, alive, alas
    {"#", "A", "LL", "AO1"},    // ally, allen (before the AL^ rule)
    {"#", "AL", "#", "AH0 L"},
    {"#", "AL", "^", "AO1 L"},  // alter, although (word-initial al-)
    {"&:^", "A", "LLY#", "AH0"},  // abnormally, academically (-ally
                                  // reduces off the first syllable)
    {"U", "A", "LL", "AH0"},    // actually, annually (u-hiatus reduces
                                // before the generic a+ll rule)
    {"&:", "A", "LS#", "AH0"},  // animals, annals, arrivals — plural -als
                                // reduces after the first vowel (gals,
                                // pals — monosyllables — keep ae)
    {"", "A", "LL", "AO1"},     // pall, calloway, nebergall
    {"", "A", "L^", "AO1"},     // salt, calm, half, bald — the binary says
                                // ao for a+l+consonant everywhere (italy,
                                // catalyst, royalty included)
    {"W", "A", "RR", "AO1"},    // warren, warrant
    {"QU", "A", "RR", "AO1"},   // quarry
    {"#", "A", "RR", "AH0"},    // arrange, arrive
    {"", "A", "RR", "AE1"},     // carrier, barro (RR then collapses)
    {"", "A", "NGE", "EY1"},    // change(r), danger, angel, anger — the
                                // binary says ey for every a+nge
    {"", "A", "NY", "EH1"},     // any, many, sanyo
    {"W", "A", "R", "AO1"},     // war(m), ware, aware, wary, warehouse
    {"", "A", "R$", "EH1"},     // tara, a before r+vowel
    {"#:", "A", "RY#", "EY1"},  // gary, mary (magic y across r; polysyllabic
                                // glossary/salary keep AA R)
    {"W", "A", "T", "AA1"},     // water, watch
    {"WH", "A", "T", "AA1"},    // what, whatever
    {"W", "A", "S", "AA1"},     // was, wasted, wasley
    {"#", "A", "SI", "EY1"},    // asia, asian (before the short rule)
    {"#", "A", "S$", "AE1"},    // asa, asahi — word-initial a+s+vowel
    {"", "A", "S$", "EY1"},     // casa, masochist
    {"", "A", "TIEN", "EY1"},   // patient, impatient, patience
    {"", "A", "WA", "AH0"},     // away, award, hathaway (keeps the W; the
                                // binary absorbs w into AO before e/i/o:
                                // awe, hawes, tawil, drawer, awoke)
    {"", "AW", "", "AO1"},
    {"W", "AR", "", "AO1 R"},   // war, ward, warm
    {"&:", "AR", "#", "ER0"},   // dollar, sugar, cigar (monosyllables —
                                // far, car, star — and, binary quirk,
                                // plural -ars keep AA R)
    {"", "AR", "", "AA1 R"},
    {"", "A", "^E:#", "EY1"},   // abel, abell, label: long when the e is
                                // the last vowel (abela keeps ae)
    {"", "A", "^LE#", "EY1"},   // table, cable, stable (magic over -le)
    {"&:", "A", "CY#", "AE1"},  // -acy nouns after the first vowel keep
                                // short a (fallacy, piracy, accuracy,
                                // legacy); spacy/stacy/tracy — no earlier
                                // vowel — stay EY; plural -acies is EY in
                                // the binary too, so the rule pins CY#
    {"", "A", "^%#", "EY1"},    // magic e incl. -er/-es/-ed/-ely/-ing
    {"", "A", "^IA", "EY1"},    // acacia, acadia, canadian, italian,
                                // radial — long a before C+ia
    {"", "A", "^IE", "EY1"},    // alien(ate), alie — long a before C+ie
    {"", "A", "^EA", "EY1"},    // azalea
    {"", "A", "XI", "EY1"},     // taxi(ed) (before the short a+C+i# rule)
    {"", "A", "^I#", "AE1"},    // abadi, salami, afghani, akali — the
                                // binary keeps short a before C+final i
    {"", "A", "^IO", "EY1"},    // abio, radio-family
    {"", "A", "^Y#", "EY1"},    // magic y (amy, lady, wavy, gary)
    {"", "A", "^EY#", "EY1"},   // paley, maley
    {"#", "A", "GENT", "EY1"},  // agent(s) — exception to agen- below
    {"#", "A", "GENCY#", "EY1"},  // agency (but agencies/agenda/agence
                                  // are short in the binary)
    {"#", "A", "GEN", "AE1"},   // agenda, agence, agencies
    {"#", "A", "GEL", "AE1"},   // ageless
    {"#", "A", "GER", "AE1"},   // ageratum, agerton
    {"", "A", "GE", "EY1"},     // bagel (agent/garage paths fire above)
    {"#", "A", "CE", "AH0"},    // acerbic, acero (word-initial)
    {"", "A", "CE", "EY1"},     // macek, palace-family
    {"", "A", "KE", "EY1"},     // aken, make-family
    {"", "A", "^EE#", "EY1"},   // magee, mcatee
    {"", "A", "^ERY#", "EY1"},  // avery, bakery
    {"I", "A", "L#", "AH0"},    // dial, trial, material
    {"#QU", "A", "L", "AE1"},   // quality, qualify (equal reduces)
    {"U", "A", "L", "AH0"},     // accruals, equal
    {"#:", "A", "#", "AH0"},
    {"&:", "A", "#", "AH0"},    // polysyllabic final a -> schwa (tufa)
    {"", "A", "", "AE1"},
    // --- B ---
    {"", "BB", "", "B B"},
    {"", "B", "#", "B"},
    {"", "B", "", "B"},
    // --- C ---
    {"#", "CHR", "", "K R"},    // christ-, chrome
    {"", "CIATE", "#", "SH EY1 T"},  // associate, dissociate
    {"", "CIA", "", "SH AH0"},  // indicia, valencia
    {"", "CIEN", "", "SH EH1 N"},  // ancient, efficiency, prescience
    {"", "CIET", "", "S AY1 EH0 T"},  // society, societies
    {"", "CIE", "", "S IY0"},   // muncie, acierno
    {"", "CI", "$", "SH"},      // -cio/-cious (gumucio, gracious)
    {"TE", "CH", "", "K"},      // tech, biotechs
    {"^E", "CH", "", "K"},      // lech, becher, albrecht, bechtel —
                                // consonant+e+ch hardens everywhere
                                // (speech/teach, vowel+e, keep ch)
    {"", "CH", "", "CH"},
    {"", "CK", "", "K"},
    {"", "C", "+", "S"},
    {"", "CCI", "$", "K SH"},   // riccio, muccio
    {"", "CCH", "", "K CH"},    // facchini, bochicchio
    {"", "CC", "+", "K S"},     // succeed, accent
    {"", "CC", "", "K K"},      // accuse, accruals (binary doubles)
    {"", "COME", "#", "K AH1 M"},  // come, become, income
    {"", "C", "", "K"},
    // --- D ---
    {"", "DD", "", "D D"},
    // -ed after a voiceless consonant devoices to /t/ (packed, washed);
    // context is the spelling letter before the silenced e
    {"KE", "D", "#", "T"},
    {"PE", "D", "#", "T"},
    {"CE", "D", "#", "T"},
    {"FE", "D", "#", "T"},
    {"HE", "D", "#", "T"},      // -shed/-ched (washed, matched)
    {"XE", "D", "#", "T"},
    {"YE", "D", "#", "T"},      // played, annoyed, employed
    {"SSE", "D", "#", "T"},     // passed, missed
    {"RSE", "D", "#", "T"},     // nursed
    {"NSE", "D", "#", "T"},     // rinsed
    {"LSE", "D", "#", "T"},     // pulsed
    {"#:^E", "D", "#", "D"},
    {"", "D", "", "D"},
    // --- E ---
    {"#:^Y^", "E", "#", "IY0"},   // byte, style, pryde, fyke
    {"#:^Y^^", "E", "#", "IY0"},  // cycle
    {"#:", "E", "#", ""},
    {"^", "E", "#", ""},  // silent final e
    {"GU", "E", "#", ""},  // silent final e after gu (vague, argue)
    {"U", "E", "D#", ""},  // construed, glued, sued
    {"U", "E", "S#", ""},  // blues, sues
    {"GU", "E", "S#", ""}, // leagues
    // -ed/-es keep a syllable after t/d and sibilants (wanted, houses)
    {"&:T", "E", "D#", "IH0"},
    {"&:D", "E", "D#", "IH0"},
    {"&:S", "E", "S#", "IH0"},
    {"&:C", "E", "S#", "IH0"},
    {"&:G", "E", "S#", "IH0"},
    {"&:Z", "E", "S#", "IH0"},
    {"&:X", "E", "S#", "IH0"},
    {"&:H", "E", "S#", "IH0"},  // -shes/-ches
    {"&:^", "E", "LY#", ""},    // silent e before -ly (wakely, lately)
    {"&:^", "E", "FUL", ""},    // silent e before -ful (tuneful,
                                // usefulness)
    {"&:^", "E", "D#", ""},     // otherwise the -ed e is silent (packed)
    {"&:^", "E", "S#", ""},     // ... and the -es e too (drakes)
    {"#B", "E", "^$", "IH0"},   // be- prefix (become, begin, belong)
    {"#D", "E", "^$", "IH0"},   // de- prefix (demon, detail, design)
    {"", "E", "RI$", "IY1"},    // bacteria, serious, experience
    {"#WH", "E", "^", "EH1"},   // where, when, whether
    {"TH", "ER", "ING#", "ER1"},  // wuthering, gathering
    {"", "E", "RING", "IY1"},   // tendering, catering, offerings — the
                                // binary says iy r for every other -ering
    {"", "E", "RI", "EH1"},     // america, maseri, roderica, limerick —
                                // e sounds eh before r+i+consonant
    {"TH", "ER", "ED#", "ER0"}, // furthered
    {"", "ER", "Y#", "ER1"},    // very, avery
    {"", "EVER", "#", "EH1 V ER0"},  // ever, whatever, never
    {"", "E", "VER", "EH1"},    // never, fever, every, several, severing —
                                // the binary keeps eh only before v-e-r
    {"", "E", "^E", "IY1"},     // seven, level, present, peters, general,
                                // telephone: medial e in an open syllable
                                // before another e sounds long
    {"", "E", "^%#", "IY1"},    // magic e on e itself (eke, theme)
    {"#:", "E", "R$", "EH1"},   // zero, hero, cleric (first vowel only;
                                // asteroid/miserables reduce to er)
    {"#", "EAR", "", "ER1"},    // earn, early, earth (word-initial)
    {"", "EAR", "N", "ER1"},    // learn, mearns
    {"", "EAR", "", "IY1 R"},
    {"", "EER", "", "IY1 R"},   // engineer, career, beer
    {"", "EE", "", "IY1"},
    {"", "EAU", "#", "IY1 Y UW1"},  // beau, plateau, bibeau, rambeau
    {"", "EA", "SUR", "EH1"},   // measure, pleasure, treasure
    {"L", "EA", "D", "IY1"},    // lead, leader (the binary's one ead=iy)
    {"", "EA", "D", "EH1"},     // head, bread, meadow — the binary says EH
                                // for every other ead (even bead, read)
    {"#:", "EA", "#", "IY1"},   // sea, tea, plea (monosyllables)
    {"", "EA", "#", "IY1 AH0"}, // area, korea, idea (final ea adds schwa)
    {"", "EA", "", "IY1"},
    {"", "EIGH", "", "EY1"},
    {"", "EI", "", "IY1"},
    {"", "EY", "", "IY1"},
    {"", "EU", "", "Y UW1"},    // euro, neuser
    {"", "E", "O", "IY1"},      // geotropism, carreon
    // EW: the binary ligates ew only in the word's first syllable
    // (#: context) — yod after f/p/h/m, plain uw otherwise; elsewhere the
    // e sounds separately before a vowel (iy: newell, brewery, renewed)
    // and is silent finally (nephew, curfew, renew -> w alone)
    {"", "EW", "E", "IY1 W"},   // newell, fewer, jewel, ewen, brewery
    {"CH", "EW", "", "UW1"},     // chew(y) — the ch digraph drops yod
    {"#:F", "EW", "", "Y UW1"},  // few
    {"#:P", "EW", "", "Y UW1"},  // pew
    {"#:H", "EW", "", "Y UW1"},  // hew
    {"#:M", "EW", "", "Y UW1"},  // mew
    {"#:K", "EW", "", "Y UW1"},  // kew, skew
    {"#:", "EW", "", "UW1"},     // new, crew, stew, sewage
    {"", "EW", "", "W"},         // nephew, sinew, mildew, renewal
    {"", "ER", "#", "ER0"},
    {"", "ER", "", "ER1"},
    {"", "E", "", "EH1"},
    // --- F ---
    {"", "FULLY", "#", "F UH1 L IY0"},  // carefully, fully
    {"", "FULL", "", "F UH1 L"},        // full(ness), fuller
    {"", "FUL", "", "F UH1 L"},  // powerful, useful(ness)
    {"", "FF", "", "F F"},
    {"", "F", "", "F"},
    // --- G ---
    {"#", "GU", "$", "G"},      // silent u word-initially: guess, guide,
                                // guard, guatemala
    {"$", "GU", "ING#", "G"},   // -guing keeps the silent u (intriguing,
                                // fatiguing, leaguing)
    {"$", "GU", "I", "G W"},    // otherwise vowel+gui sounds the glide:
                                // aguilar, beguile, maguire, seguin
                                // (round-5 census; the i keeps its own rule)
    {"", "GU", "+", "G"},       // vague, argue, silent before front vowels
    {"", "GU", "$", "G W"},     // agua, iguana, jaguar (mid gu+a glides)
    {"", "GG", "", "G"},
    {"#", "GH", "", "G HH"},    // ghost, ghetto (the binary sounds both)
    {"", "GH", "$", "G HH"},    // baugher, mcghie (sounded before a vowel;
                                // silent before t/# — caught, laugh)
    {"", "GH", "", ""},
    {"BE", "G", "", "G"},       // begin, begets (hard g)
    {"", "G", "ET", "G"},       // target, budget, forget, together
    {"", "G", "IV", "G"},       // giver, forgiven, salsgiver
    {"#", "G", "IA", "JH"},     // giant
    {"#", "G", "IU", "JH"},     // giuliani, giusti
    {"#", "G", "I$", "JH"},     // giel, giordani (gi + vowel)
    {"#", "G", "I", "G"},       // gift, girl, give, ginger
    {"", "G", "+", "JH"},
    {"", "G", "", "G"},
    // --- H ---
    {"#", "HOUR", "", "AW1 ER0"},  // hour(ly), hourlong (silent h)
    {"#", "HAVE", "", "HH AE1 V"},   // have, haves (exception to a+ve ey)
    {"#", "H", "Y", ""},           // hyson, hyperbole (the binary's
                                   // word-initial hy drops the h)
    {"#", "HW", "", "W"},  // hwa
    {"#", "H", "$", "HH"},
    {"$", "H", "#", ""},   // silent final h (oh, ah)
    {"^", "H", "#", ""},   // silent final h after a consonant (ranh)
    {"$", "H", "^", ""},   // vowel-h-consonant (john)
    {"", "H", "$", "HH"},  // intervocalic h sounds (behold, ahead)
    {"", "H", "", "HH"},
    // --- I ---
    {"", "IU", "M", "IH0 AH0"},  // rhodium, symposiums, triumph
    {"", "IU", "S", "IH0 AH0"},  // vesuvius, pocius
    {"", "IU", "", "IH0 Y UW1"},  // liu, giuliani
    {"", "IGH", "", "AY1"},
    {"", "I", "QUE#", "IY1"},   // antique, unique
    {"", "IGN", "#", "AY1 N"},  // sign, assign
    {"", "IGN", "%", "AY1 N"},  // assigning, signed
    {"", "IGN", "S#", "AY1 N"}, // resigns, signs
    {"", "IGN", "M", "AY1 N"},  // alignment(s)
    {"V", "IEW", "", "Y UW1"},  // view, review, interview
    {"", "IEW", "", "IY1 W"},   // vanliew, zbigniew
    {"F", "IED", "#", "AY1 D"},    // typified, certified
    {"X", "IED", "#", "AY1 D"},    // taxied
    {"&:^", "IED", "#", "IY0 D"},  // polysyllabic -ied (studied)
    {"&:^", "IES", "#", "IY0 S"},  // ... -ies (the binary devoices: ladies)
    {"&:^", "IE", "#", "IY0"},     // allie, charlie
    {"", "IE", "#", "AY1"},
    {"", "IE", "D#", "AY1"},    // monosyllabic died/tried
    {"", "IE", "S#", "AY1"},
    // mid-word ie: the binary sounds both letters — i long, e separate
    // (field = ay eh, siege = ay iy) — except before n/v where i is iy
    // (friend, audience, believe) and in the -ier suffix (heavier)
    {"", "IERE", "#", "IY0 ER0"},  // carriere, premiere
    {"", "I", "ER#", "IY0"},    // heavier, earlier, soldier, brier
    {"", "I", "ER$", "IY0"},    // fiero, carriere, premieres
    {"", "I", "ERS#", "IY0"},   // carriers
    {"", "I", "^ERS#", "AY1"},  // diners, miners, rivers (magic over -ers)
    {"&:", "I", "ESC", "IY1"},  // acquiesce, adolescent
    {"&:", "I", "EL", "IY1"},   // abbatiello (giel/field stay long)
    {"", "I", "EN", "IY1"},     // friend, audience, orient
    {"", "I", "EV", "IY1"},     // believe, achieve
    {"", "I", "E^", "AY1"},     // field, piece, diet, diesel, soviet
    {"", "I", "RY#", "AY1"},    // inquiry
    {"&:^", "IVE", "", "IH0 V"},   // alive, derives, active
    {"#G", "IVE", "#", "IH1 V"},   // give
    {"#G", "IVE", "S#", "IH1 V"},  // gives
    {"&:^", "IN", "EE", "IH0 N"},  // engineer (keep ee for the iy r)
    {"&:^", "IN", "E^", "IH0 N"},  // airliner, abstinence, recliner —
                                   // the e stays to sound (er/eh)
    {"&:^", "INE", "", "IH0 N"},   // define, machine, engine
    {"&:", "I", "DE#", "AY1"},   // inside, decide (d/s/t keep long i)
    {"&:", "I", "DES#", "AY1"},
    {"&:", "I", "SE#", "AY1"},   // precise, promise, advise
    {"&:", "I", "SES#", "AY1"},
    {"&:", "I", "TE#", "AY1"},   // polite, invite, despite
    {"&:", "I", "TES#", "AY1"},
    {"&:", "I", "RE#", "AY1"},   // acquire, admire, abshire
    {"&:", "I", "RES#", "AY1"},
    {"&:", "I", "RED#", "AY1"},
    {"&:", "I", "ZE#", "AY1"},   // accessorize, actualize
    {"&:", "I", "ZES#", "AY1"},
    {"&:", "I", "ZED#", "AY1"},
    {"&:", "I", "^E#", "IH1"},   // survive, advice, agile, afterlife,
                                 // airstrike — mid-word i reduces before
                                 // a silent final e
    {"&:", "I", "^ES#", "IH1"},  // offices, survives
    {"$", "I", "^Y#", "AY1"},    // acuity, inequity (vowel hiatus before)
    {"&:", "I", "TED#", "IH1"},  // accredited (acquired/advised keep ay)
    {"&:", "I", "TING#", "IH1"}, // accrediting, auditing
    {"&:", "I", "X", "IH1"},     // affixes, prefix
    {"", "I", "ME:#", "IH1"},    // accompaniment (m blocks the long i)
    {"", "I", "^E:#", "AY1"},    // accident: long when the e is the last
                                 // vowel
    {"", "IRE", "#", "AY1 R"},  // fire, admire
    {"", "IRE", "S#", "AY1 R"},
    {"", "IRE", "D#", "AY1 R"},
    {"#", "I", "V$", "IH1"},    // ivan, ivor (the binary keeps these short)
    {"#", "I", "N$", "IH1"},    // inequity (in- prefix over a vowel)
    {"#", "I", "L$", "IH1"},    // iliescu
    {"#", "I", "G$", "IH1"},    // igoe, igou
    {"#", "I", "SO", "IH1"},    // ison (isis stays long)
    {"#", "I", "M$", "IH1"},    // image, imagine, imogene
    {"#", "I", "D$", "IH1"},    // idea
    {"#", "I", "RE", "IH1"},    // irene (iris/iron stay long below)
    {"G", "I", "VE", "IH1"},    // giver, forgiven (the g+iv stem)
    {"#", "I", "^$", "AY1"},    // item, isis
    {"", "I", "R$", "AY1"},     // quiroz, i before r+vowel
    {"", "IR", "", "ER1"},
    {"", "I", "ER#", "IY0"},    // carrier, vanier
    {"", "I", "ERS#", "IY0"},   // gondoliers
    {"ER", "I", "$", "IY0"},    // bacteria, serious, period, nigeria
    {"", "I", "^%#", "AY1"},    // magic e incl. -er/-es/-ed/-ely/-ing
    {"#:", "I", "^Y#", "AY1"},  // magic y on the first vowel (tiny, city)
    {"", "I", "ND", "AY1"},
    {"", "ING", "#", "IH0 NG"},
    {"", "I", "", "IH1"},
    // --- J ---
    {"", "J", "", "JH"},
    // --- K ---
    {"#", "KN", "", "N"},
    {"", "KK", "", "K K"},
    {"", "K", "", "K"},
    // --- L ---
    {"OW", "L", "$", "AH0 L"},  // acknowledge, rowley, bowling — the
                                // binary inserts a schwa after ow/aw + l
    {"DD", "L", "E", "AH0 L"},  // addleman (doubled stop + l mid-word)
    {"FF", "L", "E", "AH0 L"},  // affleck (afflict keeps the cluster)
    {"M", "L", "E", "AH0 L"},   // aimless
    {"H", "L", "E", "AH0 L"},   // ahlen, ahlers
    {"K", "L", "E", "AH0 L"},   // anklet, anklebone
    {"T", "L", "E", "AH0 L"},   // antlers, atlee-family
    {"R", "L", "E", "AH0 L"},   // airless, harley, shirlee
    {"", "LL", "", "L"},
    // syllabic -le family: only after vowel+consonant — a bare ^ left
    // context wrongly caught word-initial clusters (cling, bley, flew)
    {"&:^", "LE", "#", "AH0 L"},  // syllabic -le (able, table)
    {"&:^", "LE", "D#", "AH0 L"},  // addled, muzzled
    {"&:^", "LES", "#", "AH0 L Z"},     // riddles
    {"&:^", "LER", "#", "AH0 L ER0"},   // angler, mechler, stemmler
    {"&:^", "LEY", "#", "AH0 L IY0"},   // stabley, ackerley
    {"&:^", "LING", "#", "AH0 L IH0 NG"},  // swindling
    {"", "L", "", "L"},
    // --- M ---
    {"", "MM", "", "M M"},
    {"", "M", "", "M"},         // (the binary keeps the b in -mb: comb)
    // --- N ---
    {"I", "NGE", "#", "NG G"},  // hinge, fringe, impinge
    {"", "NGE", "#", "N JH"},   // soft g on final -nge (change)
    {"A", "NG", "+", "N JH"},   // ranges, dangers, tangible
    {"E", "NG", "+", "N JH"},   // avenger, engel
    {"", "NG", "$", "NG G"},    // dischinger, goetzinger
    {"", "NG", "LY#", "NG"},    // shockingly, willingly (-ly suffix)
    {"", "NGLER", "", "NG G AH0 L ER0"},  // angler(s)
    {"", "NGLE", "^", "NG G AH0 L"},  // bunglers, tanglewood, singley
    {"", "NG", "L", "NG G"},    // angle, single, jungle, tanglewood
    {"", "NG", "", "NG"},
    {"", "NN", "", "N N"},
    {"", "N", "K", "NG"},       // bank, think, monkey
    {"", "N", "", "N"},
    // --- O ---
    {"", "OTHER", "", "AH1 DH ER0"},  // other(s), mother, brother
    {"H", "OUS", "", "AW1 Z"},   // house(s) keep the full vowel
    {"TH", "OUS", "", "AW1 Z"},  // thousand
    {"", "OUS", "$", "AH0 S"},   // mouse, trouser, spouses, limousine
    {"", "OUS", "L", "AH0 S"},   // famously, generously
    {"#M", "OVE", "#", "UW1 V"},      // move
    {"", "OVE", "#", "AH1 V"},        // love, dove, above
    // OUGH per the binary: -ought=ao t (bought, even drought), vowel+r
    // prefix keeps ow (thorough, borough — whose first o says er), the
    // rest default to ah f (rough, dough, furlough); through/though are
    // literals in the T group
    {"", "OR", "OUGH", "ER1"},    // thorough, borough (the first o+r)
    {"", "OUGH", "T", "AO1"},     // bought, thought, ought, drought
    {"$R", "OUGH", "", "OW1"},    // thorough, borough(s)
    {"", "OUGH", "", "AH1 F"},    // rough(est), dough, troughs, furlough
    {"", "OO", "K", "UH1"},
    {"", "OO", "D", "UH1"},     // wood, good, hagewood
    {"", "OO", "", "UW1"},
    {"", "OA", "", "OW1"},
    {"", "OE", "#", "OW1"},     // doe, inscoe
    {"", "OE", "S#", "OW1"},    // goes, toes, shoes
    {"", "O", "E", "OW1"},      // poem, phoenix, voest: both letters sound
    {"", "OYE", "", "OW1 IH0"},  // annoyed, employed, boyett, shroyer
    {"", "OY", "", "OY1"},
    {"", "OI", "", "OY1"},
    {"^", "OU", "ST", "AH1"},   // foust, joust, houston (oust stays aw)
    {"", "OUL", "D", "UH1"},    // would, could, should(er), boulder
    {"", "OU", "PLE", "AH1"},   // couple(s)
    {"", "OU", "P", "UW1"},     // soup, group, coup, coupon
    {"#", "OU", "R", "AW1"},    // our, ours
    {"#Y", "OU", "NG", "AH1"},  // young
    {"#Y", "OU", "", "UW1"},    // youth, you (word-initial only: tryouts
                                // keeps AW)
    {"", "OU", "S#", "AH0"},    // curious, various (-ous)
    {"", "OU", "R", "AO1"},     // course, lathouris
    {"", "OU", "", "AW1"},
    {"H", "OWE", "#", "AW1"},   // howe
    {"", "OWE", "#", "OW1"},    // lowe, crowe, rowe
    {"#P", "OW", "$", "AW1"},   // power(ed)
    {"#H", "OW", "", "AW1"},    // howard, howell, howl, how
    {"#D", "OW", "", "AW1"},    // down(s), downgrade, dow
    {"", "OW", "$", "OW1"},     // tower, shower, flower
    {"", "OW", "", "OW1"},      // the binary's ow default (browner, rowly)
    {"W", "OR", "^", "ER1"},    // work, word, worms
    {"", "OR", "#", "ER0"},     // unstressed final -or (doctor, hornor)
    {"", "OR", "S#", "ER0"},    // ... and its plural (savors)
    {"", "OR", "", "AO1 R"},
    {"", "OL", "D", "OW1 L"},   // old/gold/beholden family
    {"", "O", "FF", "AO1"},     // off/office
    {"", "O", "FT", "AO1"},     // soft(ware), loft
    {"", "O", "SS#", "AO1"},    // boss, cross, toss (suffixed forms — bossy,
                                // crossing, tossed — stay aa in the binary)
    {"", "O", "X", "AA1"},      // oxalis, oxygen
    {"", "O", "ST#", "OW1"},    // most, host, cost (binary: ow for all)
    {"", "O", "STS#", "OW1"},   // hosts
    {"", "O", "NG", "AO1"},     // long, song, longhi
    {"", "O", "NK", "AH1"},     // monk, monkey, donkey
    // first-syllable o before n reduces to ah in the binary (money/honey,
    // with o-n-e, and word-initial on/only are the exceptions)
    {"#C", "O", "N", "AA1"},    // conn, condoms, congruence
    {"#", "ONE", "", "W AH1 N"},  // one, oneill, onex
    {"#", "O", "NLY", "OW1"},   // only
    {"#:^", "O", "N^", "AH1"},  // monday, wonder, month, honda
    {"#:^", "O", "N#", "AH1"},  // non
    {"#:^", "O", "NI", "AH1"},  // sonic, monitor, chronicled
    {"&:^", "O", "NIS", "AA1"},  // admonish (stressed)
    {"&:^", "O", "NI$", "OW1"},  // acrimonious, begonia — long only when
                                 // a vowel follows the ni
    {"R", "O", "NI#", "AH0"},   // macaroni, pepperoni (r-onset reduces)
    {"&:^", "O", "NI", "AA1"},  // antoni, antonin, harmonic, admonition —
                                // ni + consonant/end is short in the binary
    {"#:^", "O", "NU", "AH1"},  // bonus
    {"#:^", "O", "NA", "AH1"},  // donar, monaghan, sonata
    {"&:^", "O", "MING", "OW1"},  // blossoming, bottoming — -ing magic
                                  // wins over the omi reduction below
    {"&:^", "O", "MI$", "OW1"},  // anomie, binomial, appendectomies
    {"&:^", "O", "MI", "AH1"},  // abdominal, abominable (non-initial)
    {"&:", "O", "MM", "AH0"},   // accommodate, accompany, abercrombie —
                                // o+mm reduces after the first vowel
                                // (common/comma, o in the first syllable,
                                // keep aa)
    {"&:", "O", "MP", "AH0"},   // accomplish, accompaniment
    {"&:", "O", "MY#", "AH0"},  // economy, anatomy, astronomy
    {"&:", "O", "M#", "AH0"},   // absalom, slalom — final -om reduces
    {"#:^", "O", "NO", "AH1"},  // sonoma, honor
    {"&:^", "O", "H$", "AA1"},  // alcohol, aloha — later-syllable o+h
    {"", "O", "H$", "OW1"},     // coherence, cohen
    {"Y^", "O", "N#", "AH1"},   // tyson, bryson
    {"&:^", "O", "NS#", "AH0"},  // aarons — plural -ons reduces
    {"&:^", "O", "NSON", "AH0"},  // aaronson
    {"Y^", "O", "NS#", "AH1"},  // nylons
    {"$", "O", "N#", "AH1"},    // carreon (vowel hiatus + final n)
    {"&:^", "O", "N#", "AH1"},  // aileron, polysyllabic final -on
    {"#S", "OME", "", "AH1 M"},  // some(thing), somebody
    {"#", "O", "^E", "OW1"},    // open, omen, obey (long only before e)
    {"#", "O", "&", "OW1"},     // oasis (o in hiatus)
    {"#M", "O", "V", "UW1"},    // move, moving, movies
    {"", "O", "V", "AH1"},      // cover, govern, hover, november, soviet
                                // (word-initial over/oval stay ow above)
    // first-syllable open o: long before e (model, hotel, moment,
    // closeness), after c always (society, locally), and before d/l+i
    // (bodies, nolie); the rest stay aa (coda, gogo, total, mosiman)
    {"#L", "O", "C$", "OW1"},   // local, locale, loco, locust — the
                                // binary's l-onset quirk; every other
                                // first-syllable o+c+a/o/u is short
                                // (boca, coca, bocock, documents)
    {"^", "O", "^E", "OW1"},
    {"#:^", "O", "^ING", "OW1"},  // coding, joking, boling, domingo —
                                  // -ing magic keeps the long o
    {"#:^", "O", "^I$", "OW1"},   // gobie, cobia, bodies, dozier, copier
                                  // — long before i-in-hiatus; o+C+i
                                  // before a consonant is short in the
                                  // binary (bobick, bodily, comic, bolin)
    {"", "O", "^EY#", "OW1"},   // lokey, dopey
    {"", "O", "^%#", "OW1"},    // magic e incl. -er/-es/-ed/-ely/-ing
    {"T", "O", "#", "UW1"},     // tomato, photo, cato
    {"", "O", "#", "OW1"},
    {"", "O", "", "AA1"},
    // --- P ---
    {"#", "PRE", "#", "P R IY1"},  // the bare token "pre"
    {"", "PH", "", "F"},
    {"", "PP", "", "P P"},
    {"", "P", "", "P"},
    // --- Q ---
    {"$", "QUE", "#", "K"},     // antique, unique
    {"", "QUE", "#", "K W"},    // mosque
    {"", "QU", "", "K W"},
    {"", "Q", "", "K"},
    // --- R ---
    {"#", "RHY", "", "R IH1"},  // rhythm (rhode keeps the h)
    {"WA", "RR", "", "R R"},    // warren, warrant (binary keeps both)
    {"UA", "RR", "", "R R"},    // quarrying
    {"", "RR", "", "R"},
    {"#", "RE", "^$", "R IY0"},  // re- prefix (repack, return)
    {"", "R", "", "R"},
    // --- S ---
    {"", "SCH", "#", "S CH"},   // fisch, masch, kusch (word-final only)
    {"#", "SCH", "", "S K"},    // school, scheme, schwinn -> S K W
    {"", "SCH", "", "S CH"},    // anschutz, porsche, mischief (mid-word)
    {"", "SH", "", "SH"},
    {"", "SCIA", "", "SH AH0"},   // coscia
    {"#", "SCI", "$", "S AY1"},   // science, scientist
    {"", "SC", "+", "S"},   // sc before a front vowel is one /s/: abscess,
                            // ascent, descend, adolescent, crescent — the
                            // binary consumes the cluster; letter-by-letter
                            // S + soft C doubled it (round-5 census)
    {"", "SSION", "", "SH AH0 N"},  // emission, passion
    {"", "SSUE", "#", "SH UW1"},  // issue, tissue
    {"", "SSUR", "$", "SH ER0"},  // fissures, pressure
    {"#", "SUR", "$", "SH ER1"},  // sure, surely
    {"^", "SUR", "$", "SH ER0"},  // insure (voiceless after a consonant)
    {"", "SUR", "$", "ZH ER0"},   // measuring, pleasures
    {"", "SS", "", "S"},
    {"^", "SION", "", "SH AH0 N"},  // dimension, compulsion, conversion —
                                    // consonant+sion devoices (vision,
                                    // vowel+sion, keeps zh)
    {"", "SION", "", "ZH AH0 N"},
    {"#", "S", "", "S"},
    {"", "SURE", "#", "ZH ER0"},  // lesure, composure (non-initial)
    // final s after the word's only (leading) vowel cluster voices when
    // that cluster is headed by a: gas/has/pais/bias -> z, atlas/texas -> s
    {"YE", "S", "#", "S"},      // hayes, kayes (the sounded aye e)
    {"EE", "S", "#", "S"},      // absentees, abductees
    {"&:IE", "S", "#", "S"},    // accuracies, agencies (dies/ties stay z)
    {"UE", "S", "#", "S"},      // accrues
    {"#:A", "S", "#", "Z"},
    {"#:&A", "S", "#", "Z"},
    {"#:AI", "S", "#", "Z"},
    {"#:I", "S", "#", "Z"},     // is, his, vis
    {"#:O", "S", "#", "Z"},
    {"#:&O", "S", "#", "Z"},
    // plural -s after a voiceless stop + silent e stays /s/ (drakes)
    {"KE", "S", "#", "S"},
    {"PE", "S", "#", "S"},
    {"TE", "S", "#", "S"},
    {"FE", "S", "#", "S"},
    {"GUE", "S", "#", "S"},     // leagues (binary keeps voiceless s)
    {".", "S", "#", "Z"},
    {"#^E", "S", "#", "S"},     // yes, les (pronounced e, not silent)
    {"E", "S", "#", "Z"},       // houses, riddles (post-silent-e s)
    {"^A", "S", "$", "S"},      // casa, masochist (no voicing after a)
    {"$", "S", "M", "Z"},       // -ism, sarcasm — voiced after a true
                                // vowel only (abysmal's y and consonant
                                // clusters — blacksmith, -sman — keep s)
    {"$", "S", "E#", "Z"},      // vowel + se# voices (hise, rose)
    {"$", "S", "$", "Z"},       // intervocalic s (rosener, myosin)
    {"", "S", "", "S"},
    // --- T ---
    {"#", "THROUGH", "", "TH R UW1"},  // through(out), throughs
    {"", "THOUGH", "#", "DH OW1"},     // though, although
    {"#", "THERE", "", "DH EH1 R"},  // there, therefore
    {"#", "THIS", "#", "DH IH1 S"},
    {"#", "THE", "#", "DH AH0"},
    {"", "TH", "ER", "DH"},     // weather, rather
    {"", "TH", "", "TH"},
    {"", "TTH", "", "T TH"},    // witthuhn, potthast
    {"", "TT", "", "T T"},
    {"", "TION", "E", "SH OW1 N"},  // auctioned, auctioneer — the binary
                                    // only reduces bare -tion; a trailing
                                    // e-suffix goes long (magic e)
    {"", "TION", "ING", "SH OW1 N"},  // auctioning, apportioning
    {"", "TION", "", "SH AH0 N"},
    {"", "TIEN", "", "SH AH0 N"},  // patient, patience
    {"", "TIA", "", "SH AH0"},  // -tial/-tia (partial, valentia)
    {"", "TUE", "#", "T UW1"},    // virtue's -tue, tue (silent final e)
    {"", "TU", "E", "T UW1"},     // tuesday (no ch/yod before e)
    {"", "TU", "$", "CH UW0"},    // actual, situate, mutual
    {"", "TURE", "#", "CH ER0"},  // nature, future
    {"", "TURE", "D#", "CH ER0"}, // pictured
    {"", "TURE", "S#", "CH ER0"}, // pictures, natures
    {"", "TUR", "$", "CH ER0"},   // lecturer, gesturing, maturity, turek —
                                  // tur+vowel palatalizes (century's tur+y
                                  // stays t er: $ excludes y)
    {"", "T", "", "T"},
    // --- U ---
    {"G", "U", "$", "W"},        // language, penguin, munguia (u after a
                                 // sounded g glides)
    {"", "UY", "", "AY1"},       // guyer, uyehara
    {"#", "UR", "$", "Y UH1 R"}, // urinary, uranium
    {"#", "UN", "A", "AH1 N"},   // unaware, unawares
    {"#", "UN", "O", "AH1 N"},   // unoccupied
    {"#", "UN", "^", "AH1 N"},   // un- prefix (under, unfit)
    {"#", "UN", "E", "AH1 N"},   // uneconomic, unequal
    {"P", "URE", "#", "Y UH1 R"},  // pure
    {"C", "URE", "#", "Y UH1 R"},  // cure, secure, obscure
    {"", "URE", "#", "UH1 R"},    // lure, endure, inure
    {"D", "U", "R$", "UH1"},      // during (no yod after d)
    {"L", "U", "R$", "UH1"},      // allured, alluring
    {"CH", "U", "R$", "UH1"},     // brochure(s)
    {"", "U", "R$", "Y UH1"},     // curious, furious (r+vowel)
    {"", "UR", "", "ER1"},
    {"L", "UE", "#", "UW1"},    // blue
    {"R", "UE", "#", "UW1"},    // true
    {"D", "UE", "#", "UW1"},    // due
    {"S", "UE", "#", "UW1"},    // sue
    {"J", "UE", "#", "UW1"},
    {"L", "UE", "S#", "UW1"},   // blues, clues
    {"R", "UE", "S#", "UW1"},   // trues
    {"R", "UE", "D#", "UW1"},   // construed, accrued
    {"L", "UE", "D#", "UW1"},   // glued
    {"D", "UE", "S#", "UW1"},   // dues
    {"J", "UE", "D#", "UW1"},
    {"L", "UE", "", "UW1 EH1"},  // fluent, luehring
    {"R", "UE", "", "UW1 EH1"},
    {"", "UE", "", "Y UW1"},    // cue, buerge
    // long u: bare UW after l/r/j (rule, june), else Y UW (cube, music)
    {"L", "U", "^%#", "UW1"},
    {"R", "U", "^%#", "UW1"},
    {"J", "U", "^%#", "UW1"},
    {"T", "U", "^%#", "UW1"},
    {"N", "U", "^%#", "UW1"},
    {"S", "U", "^%#", "UW1"},
    {"Z", "U", "^%#", "UW1"},   // zuver
    {"D", "U", "^%#", "UW1"},   // dunes, dude (no yod after d)
    {"", "U", "^%#", "Y UW1"},
    {"R", "U", "$", "UW1"},     // accruals, ruin
    {"L", "U", "^$", "UW1"},
    {"R", "U", "^$", "UW1"},
    {"J", "U", "^$", "UW1"},
    {"T", "U", "^$", "UW1"},
    {"N", "U", "^$", "UW1"},
    {"S", "U", "^$", "UW1"},    // sugar, susumu, super (no yod after s)
    {"Z", "U", "^$", "UW1"},    // zuba
    {"SH", "U", "^$", "UW1"},   // shupert
    {"CH", "U", "^$", "UW1"},   // chula
    {"D", "U", "^$", "UW1"},    // duty
    {"", "U", "^$", "Y UW1"},   // open syllable (music, gumucio)
    // u in hiatus (before another vowel): yod unless the consonant before
    // drops it (suit, juice, fluid vs capua, january, chihuahua)
    {"CH", "U", "$", "UW1"},    // chuan
    {"NN", "U", "$", "UW1"},    // annual (january keeps the yod)
    {"S", "U", "$", "UW1"},
    {"J", "U", "$", "UW1"},
    {"L", "U", "$", "UW1"},
    {"D", "U", "$", "UW1"},     // duey
    {"", "U", "$", "Y UW1"},
    // final u: bare UW after the yod-dropping set, else Y UW (emu, menu)
    {"L", "U", "#", "UW1"},     // flu
    {"R", "U", "#", "UW1"},     // guru
    {"D", "U", "#", "UW1"},     // hindu
    {"S", "U", "#", "UW1"},
    {"T", "U", "#", "UW1"},     // tutu
    {"CH", "U", "#", "UW1"},    // chu (zhu keeps the yod)
    {"^", "U", "#", "Y UW1"},   // emu, menu, tofu (n keeps the yod)
    {"", "U", "", "AH1"},
    // --- V ---
    {"", "V", "", "V"},
    // --- W ---
    {"#", "WR", "", "R"},
    {"#", "WHOLE", "", "HH OW1 L"},  // whole(ness)
    {"#", "WHO", "", "HH UW1"},      // who, whose, whoa
    {"", "WH", "", "W"},
    {"#", "WON", "#", "W AH1 N"},
    {"", "W", "", "W"},
    // --- X ---
    {"", "X", "", "K S"},       // the binary reads initial x as K S too
    // --- Y ---
    {"#", "Y", "", "Y"},
    {"#:^", "Y", "#", "AY1"},   // monosyllables: my, try, why, sky
    {"#:^", "Y", "$", "AY1"},   // tryout (y + vowel in the first syllable)
    {"N", "Y", "$", "IY0"},     // sanyo, canyon (y glides after n)
    {"", "Y", "#", "IY0"},
    {"", "Y", "ING#", "IY0"},   // quarrying, studying
    {"", "Y", "RI", "IH1"},     // syria, syringe stay short (myron, tyrant,
                                // syrup go long via the open-syllable rule)
    {"&:", "Y", "^E#", "IH1"},  // acolyte, analyze, paralyze
    {"&:", "Y", "^ES#", "IH1"}, // acolytes, analyzes
    {"&:", "Y", "^ED#", "IH1"}, // analyzed, paralyzed
    {"", "YRE", "#", "AY1 R IY0"},  // tyre, smyre (the binary sounds
                                    // the final e)
    {"", "Y", "^%#", "AY1"},    // lyde, style (magic e)
    {"&:", "Y", "^$", "IH1"},   // acrylic, aerodynamic (mid-word y short
                                // before an open syllable)
    {"", "Y", "^$", "AY1"},     // tyson, nylons, pyxis
    {"", "Y", "", "IH1"},
    // --- Z ---
    {"", "ZZ", "", "Z Z"},
    {"", "Z", "", "Z"},
};

// Match `pat` (context pattern) leftwards ending just before position pos.
bool match_left(const std::string& w, int pos, const char* pat) {
  int p = static_cast<int>(std::strlen(pat)) - 1;
  int i = pos - 1;
  while (p >= 0) {
    const char c = pat[p];
    if (c == '#') {
      if (i >= 0) return false;
      --p;
    } else if (c == ':') {
      while (i >= 0 && is_cons(w[i])) --i;
      --p;
    } else if (c == '^') {
      if (i < 0 || !is_cons(w[i])) return false;
      --i;
      --p;
    } else if (c == '+') {
      if (i < 0 || !is_front(w[i])) return false;
      --i;
      --p;
    } else if (c == '.') {
      if (i < 0 || !is_voiced(w[i])) return false;
      --i;
      --p;
    } else if (c == '$') {
      if (i < 0 || !is_vowel(w[i])) return false;
      --i;
      --p;
    } else if (c == '&') {
      if (i < 0 || !is_vowel(w[i])) return false;
      --i;
      while (i >= 0 && is_vowel(w[i])) --i;
      --p;
    } else {
      if (i < 0 || w[i] != c) return false;
      --i;
      --p;
    }
  }
  return true;
}

// Match `pat` rightwards starting at position pos.
bool match_right(const std::string& w, int pos, const char* pat) {
  const int n = static_cast<int>(w.size());
  int i = pos;
  for (const char* p = pat; *p; ++p) {
    const char c = *p;
    if (c == '#') {
      if (i < n) return false;
    } else if (c == ':') {
      while (i < n && is_cons(w[i])) ++i;
    } else if (c == '^') {
      if (i >= n || !is_cons(w[i])) return false;
      ++i;
    } else if (c == '+') {
      if (i >= n || !is_front(w[i])) return false;
      ++i;
    } else if (c == '.') {
      if (i >= n || !is_voiced(w[i])) return false;
      ++i;
    } else if (c == '$') {
      if (i >= n || !is_vowel(w[i])) return false;
      ++i;
    } else if (c == '&') {
      if (i >= n || !is_vowel(w[i])) return false;
      ++i;
      while (i < n && is_vowel(w[i])) ++i;
    } else if (c == '%') {
      // suffix: E | ER | ES | ED | ELY | ING
      if (i < n && w[i] == 'E') {
        ++i;
        if (i < n && (w[i] == 'R' || w[i] == 'S' || w[i] == 'D')) ++i;
        else if (i + 1 < n && w[i] == 'L' && w[i + 1] == 'Y') i += 2;
      } else if (i + 2 < n && w[i] == 'I' && w[i + 1] == 'N' &&
                 w[i + 2] == 'G') {
        i += 3;
        // -ingly extends -ing (amazingly, agonizingly keep the long vowel)
        if (i + 1 < n && w[i] == 'L' && w[i + 1] == 'Y') i += 2;
      } else {
        return false;
      }
    } else {
      if (i >= n || w[i] != c) return false;
      ++i;
    }
  }
  return true;
}

std::string convert_word(const std::string& raw) {
  std::string w;
  for (char c : raw) {
    if (std::isalpha(static_cast<unsigned char>(c))) {
      w.push_back(static_cast<char>(std::toupper(c)));
    }
  }
  if (w.empty()) return "";

  std::string out;
  int pos = 0;
  const int n = static_cast<int>(w.size());
  const int n_rules = sizeof(kRules) / sizeof(kRules[0]);
  while (pos < n) {
    bool applied = false;
    for (int r = 0; r < n_rules; ++r) {
      const Rule& rule = kRules[r];
      const int mlen = static_cast<int>(std::strlen(rule.match));
      if (rule.match[0] != w[pos]) continue;
      if (pos + mlen > n) continue;
      if (std::strncmp(w.c_str() + pos, rule.match, mlen) != 0) continue;
      if (!match_left(w, pos, rule.left)) continue;
      if (!match_right(w, pos + mlen, rule.right)) continue;
      if (rule.phones[0] != '\0') {
        if (!out.empty()) out.push_back(' ');
        out += rule.phones;
      }
      pos += mlen;
      applied = true;
      break;
    }
    if (!applied) ++pos;  // unknown character: skip
  }
  return out;
}

}  // namespace

extern "C" {

// Converts a single word; writes a space-joined ARPAbet string into `out`
// (capacity `cap`). Returns the number of bytes written (excluding NUL), or
// -1 if the buffer is too small.
int g2p_word(const char* word, char* out, int cap) {
  const std::string phones = convert_word(word);
  if (static_cast<int>(phones.size()) + 1 > cap) return -1;
  std::memcpy(out, phones.c_str(), phones.size() + 1);
  return static_cast<int>(phones.size());
}

}  // extern "C"
