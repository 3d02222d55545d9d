sieben fünf zwei
null zwei fünf
null vier acht
sechs acht eins null drei drei
null sieben acht eins vier neun
acht null null zwei sechs neun
neun null drei null sechs sechs sechs
null zwei eins zwei vier drei
sechs sechs fünf vier
eins zwei sieben
eins sechs null
zwei sieben null sieben fünf neun
fünf neun null
zwei sechs eins
acht fünf fünf drei zwei
eins eins sechs fünf sieben
sieben sechs neun zwei vier null acht
sieben null null null
drei acht neun drei vier null
null sechs fünf sieben
eins fünf neun
vier neun neun sechs sechs eins zwei
null drei acht neun sechs eins
sieben fünf sechs zwei sieben
neun drei zwei sieben null null eins
vier vier null zwei eins
neun drei vier neun sieben zwei
acht eins null neun null
null neun sechs
sechs acht neun
neun neun drei acht eins eins
eins null eins sieben vier acht acht
vier eins sechs
vier sieben vier vier null
acht sieben vier sechs zwei
drei sieben eins zwei fünf acht sechs
zwei drei neun sieben zwei acht
zwei sechs vier
sieben acht acht drei acht drei vier
vier neun acht drei vier
eins eins eins fünf eins eins
neun zwei fünf acht sechs
sechs fünf eins
vier vier fünf sechs sechs
sechs eins acht sechs
sechs null eins acht
eins sieben sechs eins zwei
neun acht eins
acht sechs sechs
vier vier acht
sechs zwei drei acht zwei sechs
acht eins zwei vier null
vier sieben acht vier acht vier
sechs neun eins eins neun drei
zwei drei zwei eins
neun sieben vier sieben eins
acht acht eins
null fünf sieben neun
fünf null zwei zwei acht sechs vier
null null sechs zwei
neun sieben fünf acht acht fünf
null zwei neun sieben null acht sieben
null drei acht null sieben
sechs zwei acht drei
sechs drei acht null drei drei
neun vier drei eins fünf sieben
vier acht null
drei null sieben null
eins sieben sieben sieben
neun sieben neun neun sieben neun drei
eins eins drei eins
sechs null null drei
zwei sieben sechs drei drei zwei
null vier sieben acht drei vier
sechs sechs acht sieben
fünf acht vier null
zwei neun sechs fünf zwei
zwei sechs eins null acht sieben fünf
sieben zwei fünf
null neun fünf
vier neun sieben sechs neun acht
sieben null drei acht vier eins acht
eins neun fünf fünf
eins fünf null vier
null sieben acht
neun sieben vier zwei sechs vier
drei eins eins neun vier eins sechs
sechs eins sieben drei fünf
sieben fünf null
null neun drei vier acht vier
acht acht eins acht neun
fünf neun sechs sechs eins zwei
fünf sieben neun neun eins
null neun eins neun null
vier sechs zwei null sechs
acht neun sieben sieben neun sieben null
eins eins sieben vier fünf fünf eins
zwei acht sieben zwei
sechs fünf vier
neun zwei eins neun
null drei drei sechs drei sieben
null eins acht vier eins fünf zwei
null drei sieben
vier sieben acht
sieben drei fünf fünf
eins drei eins
eins drei eins eins neun
fünf sechs sechs zwei vier
sieben null vier sieben
acht drei sechs
eins eins sieben null vier null sieben
fünf drei neun sieben null
neun fünf acht
fünf fünf vier drei null vier
drei drei null neun vier sechs drei
drei vier zwei neun zwei eins neun
sieben vier vier neun
eins fünf neun sieben zwei null vier
vier sechs vier sieben
fünf zwei drei sieben acht acht drei
null sieben zwei vier acht null drei
vier neun fünf vier eins neun
sechs sieben vier zwei sieben
acht null vier neun neun null
zwei fünf sechs neun neun zwei sechs
neun neun neun drei
sieben neun zwei sieben sieben sieben
fünf drei zwei sieben
null zwei null sieben neun zwei eins
sechs sieben zwei
null fünf sechs
acht fünf drei zwei sieben acht sieben
fünf null acht fünf null sieben null
vier sieben drei sieben eins
sechs eins drei fünf sechs
fünf vier drei fünf
vier acht sieben vier eins
eins eins sieben vier
drei fünf eins zwei null sechs sechs
sechs eins zwei null fünf vier acht
vier vier eins sechs sechs vier null
eins neun acht eins drei sechs
neun sechs acht drei sieben zwei acht
null eins neun
sechs null sieben fünf acht drei
vier drei drei sieben eins vier
acht vier sechs null sechs null zwei
zwei drei fünf drei eins sieben sechs
neun zwei sieben zwei fünf sieben
sieben fünf fünf
